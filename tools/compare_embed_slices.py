#!/usr/bin/env python3
"""Slice-exact oracle administration for llm_dedup_embed at stress scale.

The key's oracle SQL enumerates ALL vector pairs (inequality join); at
x100 (200k vectors) that is 2e10 pair evaluations x 64-term dot products
— resource-bound in DuckDB the same way graph_pagerank's one-shot CTE is
(CORRECTNESS_x100.md round 9). But the query's predicate is PER-PAIR, so
restricting the INPUT to a deterministic id-slice commutes with the
query: the full engine output restricted to pairs with BOTH ids in the
slice must equal DuckDB's complete answer over the slice alone. Each
slice is therefore a bit-exact oracle administration of a 1/s^2 sample
of the pair space at 1/s^2 of the cost.

Usage: python3 tools/compare_embed_slices.py <sfDir> <outDir> [mod] [residues]
  mod defaults to 16 (12.5k vectors per slice at x100), residues "0,5,11".

Dev tool only; not part of the shipped library.
"""
import os
import sys

import duckdb

# mirrors graft.ops.Det.sqlRound / the key's oracle spelling
ROUND6 = "FLOOR((cos) * 1e6 + 0.5) / 1e6"
TAU = 0.4  # Params.CosineThreshold
DIM = 64


def sql_dot(a, b):
    return " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1))


def sql_norm2(e):
    return " + ".join(
        f"CAST({e}[{i}] AS DOUBLE) * CAST({e}[{i}] AS DOUBLE)"
        for i in range(1, DIM + 1))


def main(sf_dir, out_dir, mod=16, residues=(0, 5, 11)):
    con = duckdb.connect()
    emb = f"{sf_dir}/embeddings.parquet"
    emb_src = f"read_parquet('{emb}/*.parquet')" if os.path.isdir(emb) \
        else f"read_parquet('{emb}')"
    mine_src = f"read_parquet('{out_dir}/llm_dedup_embed/*.parquet')"
    n_fail = 0
    for r in residues:
        ref = con.execute(f"""
            WITH n AS (
              SELECT vec_id, embedding, {sql_norm2('embedding')} AS n2
              FROM {emb_src} WHERE vec_id % {mod} = {r})
            SELECT v1, v2, {ROUND6} AS cos_sim FROM (
              SELECT a.vec_id AS v1, b.vec_id AS v2,
                ({sql_dot('a.embedding', 'b.embedding')})
                  / (SQRT(a.n2) * SQRT(b.n2)) AS cos
              FROM n a JOIN n b ON a.vec_id < b.vec_id)
            WHERE cos >= {TAU} ORDER BY v1, v2""").fetchall()
        mine = con.execute(f"""
            SELECT v1, v2, cos_sim FROM {mine_src}
            WHERE v1 % {mod} = {r} AND v2 % {mod} = {r}
            ORDER BY v1, v2""").fetchall()
        import struct

        def canon(rows):
            return [(a, b, struct.pack('>d', c).hex()) for a, b, c in rows]
        if canon(ref) == canon(mine):
            print(f"pass slice vec_id%{mod}=={r}: {len(ref)} pairs bit-exact")
        else:
            n_fail += 1
            print(f"FAIL slice vec_id%{mod}=={r}: engine {len(mine)} "
                  f"vs oracle {len(ref)} pairs")
    total = con.execute(f"SELECT COUNT(*) FROM {mine_src}").fetchone()[0]
    print(f"engine full output: {total} pairs "
          f"(slice checks cover {len(residues)}/{mod ** 2} of the pair space exactly)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    res = tuple(int(x) for x in sys.argv[4].split(",")) if len(sys.argv) > 4 \
        else (0, 5, 11)
    sys.exit(main(sys.argv[1], sys.argv[2], mod, res))
