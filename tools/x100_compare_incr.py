#!/usr/bin/env python3
"""Incremental DuckDB compare for the x100 gate: polls <outDir> for
completed key outputs, compares each once (threads-limited so the
engine side keeps the box), appends results to <log>. Stops when a
file named <outDir>/.engine_done exists and everything is compared.
Skips keys in SKIP (administered by dedicated tools).
Usage: tools/x100_compare_incr.py <sfDir> <outDir> <log>  (dev tool)"""
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(__file__))
import compare
from x100_skip import SKIP as SKIP_TOOLS

SKIP = set(SKIP_TOOLS)

real_connect = duckdb.connect


def tuned_connect(*a, **kw):
    con = real_connect(*a, **kw)
    con.execute("SET memory_limit='48GB'")
    con.execute("SET threads=10")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    return con


duckdb.connect = tuned_connect


def main(sf_dir, out_dir, log_path):
    done = set()
    if os.path.exists(log_path):
        for line in open(log_path):
            if line.startswith(("pass ", "FAIL ")):
                done.add(line.split()[1].rstrip(":"))
    while True:
        ready = {d for d in os.listdir(out_dir)
                 if os.path.isdir(os.path.join(out_dir, d))
                 and not d.startswith("_")
                 and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))}
        todo = sorted(ready - done - SKIP)
        engine_done = os.path.exists(os.path.join(out_dir, ".engine_done"))
        if not todo and engine_done:
            break
        if not os.path.exists(os.path.join(out_dir, "oracle_sql.json")):
            time.sleep(30)
            continue
        for key in todo:
            t0 = time.time()
            with open(log_path, "a") as lf:
                old = sys.stdout
                sys.stdout = lf
                try:
                    compare.main(sf_dir, out_dir, {key})
                except Exception as e:
                    print(f"FAIL {key}: comparer crashed: {e}")
                finally:
                    sys.stdout = old
            with open(log_path, "a") as lf:
                lf.write(f"# {key} compared in {time.time()-t0:.0f}s\n")
            done.add(key)
        if not todo:
            time.sleep(60)
    with open(log_path, "a") as lf:
        lf.write("# all compares done\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
