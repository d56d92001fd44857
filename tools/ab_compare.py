#!/usr/bin/env python3
"""Compare two graft bench detail files (KEEP vs FREE checkpoint arms)
and emit the REGRESSION_AB artifact: per-query min-of-reps ratios, the
six r17 `weak` queries called out, regime context included so the
numbers are interpretable.

Usage: ab_compare.py <keep_detail.json> <free_detail.json> <out.json>
         [ref_detail.json]
ref_detail.json (optional) = the r16 reference detail at the same SF for
like-for-like context.
"""
import json
import sys

WEAK = ["d16_decontaminate_bloom", "d17_source_sketch_overlap",
        "s02_knn_lsh", "s03_label_centroids",
        "q33_nested_json_flatten", "q34_keyword_prefix"]


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries_min"' in line:
                return json.loads(line)
    raise SystemExit(f"no detail line in {path}")


def main():
    keep, free, out = sys.argv[1], sys.argv[2], sys.argv[3]
    ref = sys.argv[4] if len(sys.argv) > 4 else None
    k, f = load(keep), load(free)
    r = load(ref) if ref else None
    qs = sorted(set(k["queries_min"]) & set(f["queries_min"]))
    per = {}
    failed = []
    for q in qs:
        km, fm = k["queries_min"][q], f["queries_min"][q]
        # Bench records a failed query as -1.0; a sentinel must be flagged,
        # never mixed into ratios/totals as a negative "speedup"
        if km < 0 or fm < 0:
            failed.append({"query": q, "keep_min": km, "free_min": fm})
            continue
        e = {"keep_min": km, "free_min": fm,
             "free_over_keep": round(fm / km, 3) if km > 0 else None,
             "shuffle_keep_mb": k["shuffle_mb"].get(q),
             "shuffle_free_mb": f["shuffle_mb"].get(q)}
        if r and q in r.get("queries_min", {}):
            rm = r["queries_min"][q]
            e["ref_min"] = rm
            e["free_over_ref"] = round(fm / rm, 3) if rm > 0 else None
            e["keep_over_ref"] = round(km / rm, 3) if rm > 0 else None
        per[q] = e
    doc = {
        "metric": "regression_ab",
        "arms": {"keep": "SPARK_GRAFT_KEEP_CHECKPOINTS=1 (r17 behavior: "
                         "consume-once localCheckpoint blocks resident for "
                         "the rest of the suite)",
                 "free": "CacheHygiene.freeTransient between reps "
                         "(memo tables pinned)"},
        "sf": k.get("sf"),
        "regime_keep": k.get("regime"), "regime_free": f.get("regime"),
        "total_min_keep": k.get("total_min"),
        "total_min_free": f.get("total_min"),
        "weak_queries": {q: per[q] for q in WEAK if q in per},
        "failed_queries": failed,
        "queries": per,
    }
    with open(out, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=False)
    print(json.dumps({q: per[q] for q in WEAK if q in per}, indent=1))


if __name__ == "__main__":
    main()
