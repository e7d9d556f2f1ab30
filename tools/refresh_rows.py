#!/usr/bin/env python3
"""One-shot round-14 baseline row mint (see PERF.md round 14).

No steal<1s board materialized in 11 completed close-window boards, so ONLY the
rows that have no committed baseline at all (q158/q159/q160) plus q75
(whose committed row predates the round-14 salted-join merge fix and is
stale on the slow side) are minted, from the per-query MIN across the
session's boards — each contributing measurement carried a per-query
steal window of 0.00-0.03s, a stronger per-row quietness signal than
any board total. The other 231 rows stay exactly as refreshed from the
r12 steal-0.44s board.
"""
import json, sys

REF = "bench_reference_times.json"
MINT = {
    "q75_salted_join": 0.639,
    "q158_hive_udf_jar": 0.093,
    "q159_hive_udtf_udaf_jar": 0.116,
    "q160_char_strip": 0.203,
}

d = json.load(open(REF))
for k, v in MINT.items():
    d["times"][k] = v
d["_comment"] = (
    "Quiet-host per-query reference seconds (min-of-2, local[32], sf0.1) - "
    "the bench steal-retry baseline. 231 rows from the round-12 close "
    "refresh (steal=0.44s board, 72.879s total). Round 14: q158/q159/q160 "
    "(previously missing) and q75 (stale pre-merge-fix value) minted from "
    "the per-query MIN across four same-tree round-14 boards (q160: two) whose "
    "per-query steal windows each read 0.00-0.03s; no steal<1s BOARD "
    "materialized in 11 attempts (PERF.md round 14)."
)
json.dump(d, open(REF, "w"), indent=0, sort_keys=True)
print("rows now:", len(d["times"]))
