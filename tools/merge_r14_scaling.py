"""Merge the r14 full-registry sweep's per-chunk/per-heavy artifacts
into the final scaling_r14_full_registry_sf1_sf10.json — the same
merge run_full_scaling.py performs at the end, runnable standalone so
a sweep interrupted during the heavy-anchor phase still produces the
merged record. Heavies not yet re-measured this round fall back to
their r13 per-heavy artifacts (same quadratic oracle anchors, each
reason-annotated there), recorded with a "from_round": "r13" marker.
"""

from __future__ import annotations

import glob
import json
import os

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
STEM = "scaling_r14_full_registry_sf1_sf10"


def main() -> None:
    merged: dict[str, dict] = {}
    for f in sorted(glob.glob(os.path.join(ART, f"{STEM}_part*.json"))):
        merged.update(json.load(open(f))["queries"])
    r14_heavy = set()
    for f in sorted(glob.glob(os.path.join(ART, f"{STEM}_heavy_*.json"))):
        q = json.load(open(f))["queries"]
        merged.update(q)
        r14_heavy.update(q)
    fallback = []
    for f in sorted(
        glob.glob(os.path.join(ART, "scaling_r13_full_registry_sf1_sf10_heavy_*.json"))
    ):
        for name, row in json.load(open(f))["queries"].items():
            if name not in merged:
                merged[name] = {**row, "from_round": "r13"}
                fallback.append(name)
    timed = {k: v for k, v in merged.items() if "small" in v and v.get("big") is not None}
    rec = {
        "metric": "scaling_sf0.1_to_sf1",
        "data_factor": 10,
        "small_dir": os.path.join(os.path.dirname(ART), ".localdata/sf1"),
        "big_dir": os.path.join(os.path.dirname(ART), ".localdata/sf10"),
        "protocol": "fresh JVM per <=40-query chunk; heavy anchors one per "
        "process, 2400s hard timeout; heavies not re-measured in r14 carry "
        "their r13 rows (from_round marker)",
        "queries": merged,
        "small_total": round(sum(v["small"] for v in timed.values()), 3),
        "big_total": round(sum(v["big"] for v in timed.values()), 3),
        "n_timed": len(timed),
        "n_total": len(merged),
        "r13_fallback_heavies": sorted(fallback),
    }
    rec["total_ratio"] = round(rec["big_total"] / rec["small_total"], 2)
    out = os.path.join(ART, f"{STEM}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: rec[k] for k in (
        "small_total", "big_total", "total_ratio", "n_timed", "n_total",
        "r13_fallback_heavies",
    )}))


if __name__ == "__main__":
    main()
