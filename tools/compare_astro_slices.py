#!/usr/bin/env python3
"""Slice-exact oracle administration for astro_crossmatch_zones at
stress scale (same commuting-slice argument as compare_embed_slices.py).

At x100 the full oracle enumerates ~4.5e9 banded candidate pairs and
the answer itself is ~6e8 rows — resource-bound in DuckDB. But the
query is a per-pair predicate over blocked candidates, and the blocking
is per-row, so restricting BOTH input catalogs to deterministic id
residues commutes with the query: DuckDB's complete answer over the
sliced catalogs must equal the engine's full output restricted to pairs
with both ids in the slices. Each (ra, rb) slice administers a 1/m^2
sample of the pair space bit-exactly at 1/m^2 the cost.

The oracle SQL is taken VERBATIM from the engine dump's
oracle_sql.json and run over slice-filtered `orders`/`customer` views —
no re-spelling of the band math that could drift.

Usage: tools/compare_astro_slices.py <sfDir> <outDir> [mod] [slices]
  mod defaults to 8; slices "0:0,3:5,7:2" (aRes:bRes pairs).
Dev tool only.
"""
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
from compare import canon  # noqa: E402


def view(sf_dir, t):
    src = f"{sf_dir}/{t}.parquet"
    return f"read_parquet('{src}/*.parquet')" if os.path.isdir(src) \
        else f"read_parquet('{src}')"


def main(sf_dir, out_dir, mod=8, slices=((0, 0), (3, 5), (7, 2))):
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["astro_crossmatch_zones"]
    ok = True
    for ra, rb in slices:
        con = duckdb.connect()
        con.execute("SET memory_limit='40GB'")
        con.execute("SET threads=16")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        con.execute(f"""CREATE VIEW orders AS
            SELECT * FROM {view(sf_dir, 'orders')}
            WHERE o_orderkey % {mod} = {ra}""")
        con.execute(f"""CREATE VIEW customer AS
            SELECT * FROM {view(sf_dir, 'customer')}
            WHERE c_custkey % {mod} = {rb}""")
        ref = con.execute(sql).fetchall()
        mine = con.execute(f"""
            SELECT * FROM
              read_parquet('{out_dir}/astro_crossmatch_zones/*.parquet')
            WHERE a_id % {mod} = {ra} AND b_id % {mod} = {rb}
            ORDER BY a_id, b_id""").fetchall()
        tag = f"slice a%{mod}={ra}, b%{mod}={rb}"
        if len(ref) != len(mine):
            print(f"FAIL astro_crossmatch_zones [{tag}]: "
                  f"rows {len(mine)} != {len(ref)}")
            ok = False
        else:
            bad = next((i for i, (m, r) in enumerate(zip(mine, ref))
                        if [canon(v) for v in m] != [canon(v) for v in r]),
                       None)
            if bad is not None:
                print(f"FAIL astro_crossmatch_zones [{tag}]: row {bad}: "
                      f"{mine[bad]} != {ref[bad]}")
                ok = False
            else:
                print(f"pass astro_crossmatch_zones [{tag}]: "
                      f"{len(mine)} rows", flush=True)
        con.close()
    return 0 if ok else 1


if __name__ == "__main__":
    mod = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    slices = tuple(tuple(int(x) for x in s.split(":"))
                   for s in sys.argv[4].split(",")) if len(sys.argv) > 4 \
        else ((0, 0), (3, 5), (7, 2))
    sys.exit(main(sys.argv[1], sys.argv[2], mod, slices))
