"""Merge the r11 full-registry sf1->sf10 sweep artifacts (chunk parts
+ per-process heavy singles) into one record, annotating the exact
anchors that are single-node-infeasible at sf10 instead of silently
dropping them (the no-silent-caps rule).

    python tools/merge_r11_scaling.py [out_path]

"queries" holds timed rows only (render_md-compatible); "untimed"
holds every registry entry that has no sf10 timing, each with the
measured reason. The registry count check asserts nothing was lost.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = "/root/repo/artifacts"

# anchors whose sf10 run crashed (Py4JJavaError in the log: python
# worker / executor OOM in the exact O(n^2) pair or matmul stage) or
# that were cut at the session deadline. Every one is an EXACT ORACLE
# ANCHOR whose certified scale twin IS timed in this artifact.
UNTIMED: dict[str, dict] = {
    "cluster_representatives": {
        "small": 35.247,
        "reason": "sf10 crash (exact O(n^2) jaccard pair graph; "
        "scale twin cluster_representatives_lsh timed x8.2)",
    },
    "dedup_clusters": {
        "small": 29.811,
        "reason": "sf10 crash at 8 GB heap (connected components over the exact "
        "verified pair graph; incremental/LSH cluster paths are the "
        "scale twins, cluster_representatives_lsh timed x8.2)",
    },
    "dedup_summary": {
        "small": 26.167,
        "reason": "sf10 crash at the harness's fixed 8 GB heap "
        "(rolls up the exact verified pair graph; capped twins timed)",
    },
    "split_leakage_audit": {
        "small": 26.999,
        "reason": "sf10 crash at 8 GB heap (exact cross-split pair "
        "audit over the verified pair graph; same anchor family)",
    },
    "dedup_threshold_curve": {
        "small": 25.692,
        "reason": "sf10 crash at 8 GB heap (sweeps thresholds over "
        "the exact pair graph whose rows grow x100 on the upsample; "
        "the r10-documented x13-at-sf1 output-bound anchor)",
    },
    "containment_dup_pairs": {
        "small": 24.513,
        "reason": "sf10 crash (uncapped containment pair emission; "
        "capped twins in dedup.py timed <=x2.6 in r10)",
    },
    "cosine_dup_pairs_blocked": {
        "reason": "cut at deadline: fixed-16-centroid buckets go "
        "quadratic at sf10 (x11.1 first decade, single sf10 run "
        ">20 min); adaptive twin srp_dup_pairs timed x24.7 against "
        "x100 output growth",
    },
    "jaccard_pairs": {
        "reason": "exact O(n^2) shingle-join baseline — the oracle "
        "anchor minhash_lsh_pairs (timed x9.2) is verified against; "
        "sf10 single-node infeasible by design",
    },
    "lsh_recall_summary": {
        "reason": "embeds jaccard_pairs as ground truth; same "
        "exact-anchor class",
    },
    "nearest_neighbor": {
        "reason": "sf10 crash in first sweep attempt (documented "
        "BASELINE-ONLY O(n^2 d) matmul, ~120 GB per bucket at 500k "
        "vectors); scale twin nearest_neighbor_capped timed",
    },
    "nearest_neighbor_blocked": {
        "reason": "fixed-16-block replication of ALL queries grows "
        "per-bucket matmul with corpus size — same class as "
        "nearest_neighbor; capped twin timed",
    },
    "cosine_dup_pairs": {
        "reason": "exact all-pairs cosine baseline (oracle anchor of "
        "srp_dup_pairs / blocked twins); sf10 single-node infeasible",
    },
    "semantic_prune": {
        "reason": "fixed-16-centroid BLAS buckets (7.7 GB matrix per "
        "bucket at sf10); hard-capped twin semantic_prune_capped "
        "timed",
    },
    "srp_recall_summary": {
        "small": 9.777,
        "reason": "sf10 crash (embeds the exact cosine ground truth "
        "for recall; the SRP path itself timed x24.7)",
    },
}


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(ART, "scaling_r11_full_registry_sf1_sf10.json")
    )
    merged: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(ART, "scaling_r11_part*.json"))) + sorted(
        glob.glob(os.path.join(ART, "scaling_r11_heavy_*.json"))
    ):
        merged.update(json.load(open(p))["queries"])
    timed = {
        k: v for k, v in merged.items() if v.get("big") is not None
    }
    untimed = dict(UNTIMED)
    for k, v in merged.items():
        if v.get("big") is None and k not in untimed:
            untimed[k] = {"small": v.get("small"), "reason": v.get("error", "?")}

    from data_pipeline_example_spark.plans.queries import QUERIES

    missing = sorted(set(QUERIES) - set(timed) - set(untimed))
    rec = {
        "metric": "scaling_sf0.1_to_sf1",  # render_md-compatible shape
        "data_factor": 10,
        "small_dir": "/root/repo/.localdata/sf1",
        "big_dir": "/root/repo/.localdata/sf10",
        "protocol": "fresh JVM per <=40-query chunk (noop sink, min of 2 "
        "runs); heavy/exact anchors one per process; anchors infeasible "
        "at sf10 single-node recorded under 'untimed' with reasons",
        "queries": timed,
        "untimed": untimed,
        "missing": missing,
        "small_total": round(sum(v["small"] for v in timed.values()), 3),
        "big_total": round(sum(v["big"] for v in timed.values()), 3),
        "n_timed": len(timed),
        "n_untimed": len(untimed),
        "n_registry": len(QUERIES),
    }
    rec["total_ratio"] = round(rec["big_total"] / rec["small_total"], 2)
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(
        json.dumps(
            {
                k: rec[k]
                for k in (
                    "small_total",
                    "big_total",
                    "total_ratio",
                    "n_timed",
                    "n_untimed",
                    "n_registry",
                    "missing",
                )
            }
        )
    )


if __name__ == "__main__":
    main()
