#!/usr/bin/env python3
"""Stepwise administration for the ×100 `llm_semdedup` oracle.

The one-shot spelling crosses n≈240k vectors × k≈3.7k seed centroids
with two 64-double lists on every intermediate row — DuckDB spilled
>69 GB of temp and ENOSPCed (observed twice, round 13). This runner
executes the IDENTICAL math as discrete temp-table steps: the
assignment cross-product runs in vec_id-residue batches (each a
separate bounded query whose output is one row per vector), then the
within-cluster pair scan and removal aggregation run one-shot (cluster
populations are ~64, so that stage is small at any scale). The final
comparison is compare.py's bit-exact float canon — the removal list is
only ~n/6 rows. Dev tool only.

Usage: tools/semdedup_oracle_stepwise.py <sfDir> <outDir> [slices]
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
import compare  # canon + TABLES  # noqa: E402

DIM = 64
AUG_OFFSET = 1000000000000
TAU = 0.9
KEY = "llm_semdedup"


def dot(a, b):
    return " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, DIM + 1))


def main(sf_dir, out_dir, slices="16"):
    slices = int(slices)
    con = duckdb.connect()
    con.execute("SET memory_limit='48GB'")
    con.execute("SET threads=12")
    con.execute("SET temp_directory='/tmp/duckdb_spill_semdedup'")
    emb = f"'{sf_dir}/embeddings.parquet" + (
        "/*.parquet'" if os.path.isdir(f"{sf_dir}/embeddings.parquet") else "'")
    vlist = "[" + ", ".join(
        f"CAST(embedding[{i}] AS DOUBLE)" for i in range(1, DIM + 1)) + "]"
    auglist = "[" + ", ".join(
        f"0.9 * a.v[{i}] + 0.1 * b.v[{i}]" for i in range(1, DIM + 1)) + "]"
    con.execute(f"CREATE TEMP TABLE b0 AS SELECT vec_id, {vlist} AS v FROM {emb}")
    (k,) = con.execute("SELECT GREATEST(4, COUNT(*) // 64) FROM b0").fetchone()
    con.execute(f"""CREATE TEMP TABLE n AS
        SELECT vec_id, v, ({dot('v', 'v')}) AS n2 FROM (
          SELECT vec_id, v FROM b0
          UNION ALL
          SELECT a.vec_id + {AUG_OFFSET}, {auglist}
          FROM b0 a JOIN b0 b ON b.vec_id = a.vec_id + 1
          WHERE a.vec_id % 5 = 0)""")
    con.execute(
        f"CREATE TEMP TABLE seeds AS SELECT vec_id AS sid, v AS sv, "
        f"({dot('v', 'v')}) AS svn2 FROM b0 WHERE vec_id < {k}")
    con.execute("CREATE TEMP TABLE assign (vec_id BIGINT, cluster BIGINT)")
    for i in range(slices):
        con.execute(f"""INSERT INTO assign
            SELECT vec_id, b.sid FROM (
              SELECT n.vec_id, MIN(struct_pack(
                d2 := (n.n2 - 2.0 * ({dot('n.v', 's.sv')}) + s.svn2),
                sid := s.sid)) AS b
              FROM n CROSS JOIN seeds s
              WHERE n.vec_id % {slices} = {i}
              GROUP BY n.vec_id)""")
        print(f"  assigned slice {i + 1}/{slices}", flush=True)
    ref = con.execute(f"""
        WITH av AS (SELECT a.vec_id, a.cluster, n.v, n.n2
                    FROM assign a JOIN n ON n.vec_id = a.vec_id),
        pairs AS (
          SELECT a.cluster, a.vec_id AS id1, b.vec_id AS id2
          FROM av a JOIN av b
           ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE ({dot('a.v', 'b.v')}) / (SQRT(a.n2) * SQRT(b.n2)) >= {TAU})
        SELECT id2 AS vec_id, cluster, MIN(id1) AS canon_id,
               CAST(COUNT(*) AS BIGINT) AS n_dups
        FROM pairs GROUP BY id2, cluster ORDER BY vec_id""")
    ref_cols = [d[0] for d in ref.description]
    ref_rows = ref.fetchall()
    mine = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{KEY}/*.parquet')")
    my_cols = [d[0] for d in mine.description]
    my_rows = mine.fetchall()
    if sorted(my_cols) != sorted(ref_cols):
        print(f"FAIL {KEY}: schema {sorted(my_cols)} != {sorted(ref_cols)}")
        return 1
    if len(my_rows) != len(ref_rows):
        print(f"FAIL {KEY}: rows {len(my_rows)} != {len(ref_rows)}")
        return 1
    mperm = sorted(range(len(my_cols)), key=lambda i: my_cols[i])
    rperm = sorted(range(len(ref_cols)), key=lambda i: ref_cols[i])
    mine_sorted = sorted([compare.canon(r[i]) for i in mperm] for r in my_rows)
    ref_sorted = sorted([compare.canon(r[i]) for i in rperm] for r in ref_rows)
    if mine_sorted != ref_sorted:
        bad = next(i for i, (a, b) in enumerate(zip(mine_sorted, ref_sorted))
                   if a != b)
        print(f"FAIL {KEY}: row {bad}: {mine_sorted[bad]} != {ref_sorted[bad]}")
        return 1
    print(f"pass {KEY}: {len(my_rows)} rows (stepwise, bit-exact)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
