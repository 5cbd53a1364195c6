#!/usr/bin/env python3
"""Stepwise administration of the llm_dedup_minhash_incremental oracle
at stress scale: the SAME bounded temp-table pipeline as
minhash_oracle_stepwise.py (the one-shot oracle re-inlines the 73M-row
shingle CTE and ENOSPCs /tmp at x100), with the candidate set
restricted to pairs touching the batch (doc_id % 3 = 0) — exactly the
incremental key's oracle. Dev tool only.

Usage: python3 tools/minhash_incremental_oracle.py <sfDir> <outDir>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
from minhash_oracle_stepwise import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], "llm_dedup_minhash_incremental"))
