"""Single source of truth for keys EXCLUDED from the automated x100
DuckDB compare (x100_compare_incr.py / x100_compare.sh). Each has a
dedicated administration tool that runs the same math in a bounded,
spill-safe way — running the one-shot oracle at x100 for these keys is
either Θ(n²) (embed), re-inlines a 73M-row CTE three times and ENOSPCs
/tmp (minhash — observed 70GB+ temp in round 10), needs iteration
(pagerank), or needs the slice protocol (astro 585M-row output).

SKILL.md (.claude/skills/verify) documents the same list; keep in sync
by importing THIS constant, never by respelling the set.
"""
SKIP = {
    "graph_pagerank": "tools/pagerank_oracle_stepwise.py",
    "llm_dedup_embed": "tools/compare_embed_slices.py",
    "astro_crossmatch_zones": "tools/compare_astro_slices.py",
    "llm_dedup_minhash_lsh": "tools/minhash_oracle_stepwise.py",
    # same 73M-row shingle CTE economics, candidates restricted to
    # pairs touching the batch — administered by the same stepwise
    # pipeline via a key-selecting wrapper
    "llm_dedup_minhash_incremental": "tools/minhash_incremental_oracle.py",
    # 105M-row answer: compare.py fetchall()s both sides into Python
    # (~100GB RSS, OOM-killed twice in round 13); the set-op runner
    # keeps the whole comparison inside DuckDB's memory_limit
    # (defaults to this key when invoked as `tool.py <sf> <out>`)
    "events_resample_locf": "tools/compare_setops.py",
    # the one-shot assignment cross-product (n vectors × n/64 seed
    # centroids, two 64-double lists per row) spilled >69GB and
    # ENOSPCed at ×100; the stepwise tool batches it by vec_id residue
    "llm_semdedup": "tools/semdedup_oracle_stepwise.py",
}
