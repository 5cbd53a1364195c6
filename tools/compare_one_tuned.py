#!/usr/bin/env python3
"""One-key replica of tools/compare.py with tuned DuckDB resources.

The x100 graph_pagerank oracle (3 fixed-point iterations over a 120M-row
edge list) exceeded the box's free disk when DuckDB spilled its default
hash joins. This runner pins a high memory_limit (spill less), a
controlled thread count (fewer per-thread operator buffers), and an
explicit temp_directory, for targeted re-checks of resource-heavy keys.

Usage: python3 tools/compare_one_tuned.py <sfDir> <outDir> <key>
       [memory_limit] [threads]
Dev tool only; comparison logic matches tools/compare.py (bit-exact).
"""
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
import compare  # noqa: E402


def main(sf_dir, out_dir, key, mem="100GB", threads="16"):
    # monkey-patch connect so compare.main's connection gets the tuning
    real_connect = duckdb.connect

    def tuned_connect(*a, **kw):
        con = real_connect(*a, **kw)
        con.execute(f"SET memory_limit='{mem}'")
        con.execute(f"SET threads={threads}")
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
        return con

    duckdb.connect = tuned_connect
    try:
        return compare.main(sf_dir, out_dir, {key})
    finally:
        duckdb.connect = real_connect


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
