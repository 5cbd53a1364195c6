#!/usr/bin/env python3
"""Set-operation administration for outputs too large to materialize in
Python (the ×100 `events_resample_locf` answer is 105M rows; compare.py
fetchall()s both sides as Python tuples + canon strings — ~100GB RSS,
OOM). This runner keeps the ENTIRE comparison inside DuckDB, which
hash-joins/spills within its memory_limit:

    rows(engine) EXCEPT ALL rows(oracle)  UNION ALL  (oracle EXCEPT ALL engine)
    → must be empty, plus a row-count and column-name check.

Equality level: DuckDB value equality (multiset-exact). For float
columns this treats -0.0 == 0.0 and groups NaNs together — WEAKER than
compare.py's bit-pattern canon only in those two corners; sound here
because both sides derive the values with identical arithmetic, so a
±0/NaN divergence would also flip the count. Dev tool only.

Usage: tools/compare_setops.py <sfDir> <outDir> <key> [mem] [threads]
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
import compare  # reuse the TABLES list + events-view logic  # noqa: E402


def main(sf_dir, out_dir, key="events_resample_locf", mem="80GB", threads="12"):
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute(f"SET threads={threads}")
    con.execute("SET temp_directory='/tmp/duckdb_spill_setops'")
    for t in compare.TABLES:
        src = f"read_parquet('{sf_dir}/{t}.parquet" + (
            "/*.parquet')" if os.path.isdir(f"{sf_dir}/{t}.parquet") else "')")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
        if t == "events":
            (typ,) = con.execute(
                "SELECT typeof(ts) FROM events LIMIT 1").fetchone()
            if typ == "BIGINT":
                con.execute(
                    "CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    "(CAST(make_timestamp(ts // 1000) AS TIMESTAMP_NS)"
                    f" AS ts) FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[key]
    mine = f"read_parquet('{out_dir}/{key}/*.parquet')"

    my_cols = [d[0] for d in con.execute(
        f"SELECT * FROM {mine} LIMIT 0").description]
    ref_cols = [d[0] for d in con.execute(
        f"SELECT * FROM ({oracle}) LIMIT 0").description]
    if sorted(my_cols) != sorted(ref_cols):
        print(f"FAIL {key}: schema {sorted(my_cols)} != {sorted(ref_cols)}")
        return 1
    cols = ", ".join(f'"{c}"' for c in sorted(my_cols))

    (n_mine,) = con.execute(f"SELECT COUNT(*) FROM {mine}").fetchone()
    (n_ref,) = con.execute(f"SELECT COUNT(*) FROM ({oracle})").fetchone()
    if n_mine != n_ref:
        print(f"FAIL {key}: rows {n_mine} != {n_ref}")
        return 1

    (n_diff,) = con.execute(f"""
        SELECT COUNT(*) FROM (
          (SELECT {cols} FROM {mine} EXCEPT ALL SELECT {cols} FROM ({oracle}))
          UNION ALL
          (SELECT {cols} FROM ({oracle}) EXCEPT ALL SELECT {cols} FROM {mine})
        )""").fetchone()
    if n_diff != 0:
        print(f"FAIL {key}: {n_diff} multiset-different rows")
        return 1
    print(f"pass {key}: {n_mine} rows (set-op multiset-exact)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
