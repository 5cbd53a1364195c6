#!/usr/bin/env python3
"""Stepwise administration of the graph_pagerank oracle for huge inputs.

The one-shot recursive-CTE spelling in SparkEntry.oracleSql makes DuckDB
materialize/spill the 120M-row edge list through a 3-iteration join
pipeline — at x100 that spilled past the box's free disk twice. This
runner executes the IDENTICAL integer fixed-point math as discrete
statements over temp tables (edges materialized once with degree, one
small join + aggregate per iteration), then compares the final ranks
against the engine parquet with tools/compare.py's bit-exact canon.

Usage: python3 tools/pagerank_oracle_stepwise.py <sfDir> <outDir>
Dev tool only.
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
from compare import canon  # noqa: E402


def view(sf_dir, t):
    src = f"{sf_dir}/{t}.parquet"
    return f"read_parquet('{src}/*.parquet')" if os.path.isdir(src) \
        else f"read_parquet('{src}')"


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET memory_limit='80GB'")
    con.execute("SET threads=16")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    con.execute(f"""CREATE TEMP TABLE pairs AS
        SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        FROM {view(sf_dir, 'orders')} o JOIN {view(sf_dir, 'lineitem')} l
          ON o.o_orderkey = l.l_orderkey""")
    con.execute("""CREATE TEMP TABLE edges AS
        SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs""")
    con.execute("DROP TABLE pairs")
    con.execute("""CREATE TEMP TABLE deg AS
        SELECT a, COUNT(*) AS outdeg FROM edges GROUP BY a""")
    # the engine's edgesD: degree riding on each edge row, built once
    con.execute("""CREATE TEMP TABLE edgesd AS
        SELECT e.a, e.b, d.outdeg FROM edges e JOIN deg d ON e.a = d.a""")
    con.execute("DROP TABLE edges")
    con.execute("""CREATE TEMP TABLE ranks AS
        SELECT a AS node, CAST(1000000 AS BIGINT) AS pr FROM deg""")
    for i in range(3):
        con.execute("""CREATE TEMP TABLE contribs AS
            SELECT e.b, SUM((r.pr * 85) // (100 * e.outdeg)) AS sc
            FROM edgesd e JOIN ranks r ON e.a = r.node GROUP BY e.b""")
        con.execute("""CREATE OR REPLACE TEMP TABLE ranks AS
            SELECT deg.a AS node,
                   CAST(150000 + COALESCE(sc, 0) AS BIGINT) AS pr
            FROM deg LEFT JOIN contribs ON deg.a = contribs.b""")
        con.execute("DROP TABLE contribs")
        print(f"iteration {i + 1} done", flush=True)
    ref = con.execute(
        "SELECT node, pr FROM ranks ORDER BY node").fetchall()
    mine = con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/graph_pagerank/*.parquet')"
        " ORDER BY node").fetchall()
    if len(ref) != len(mine):
        print(f"FAIL graph_pagerank: rows {len(mine)} != {len(ref)}")
        return 1
    for i, (m, r) in enumerate(zip(mine, ref)):
        if [canon(v) for v in m] != [canon(v) for v in r]:
            print(f"FAIL graph_pagerank: row {i}: {m} != {r}")
            return 1
    print(f"pass graph_pagerank: {len(mine)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
