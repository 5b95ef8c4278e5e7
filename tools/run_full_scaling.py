"""Full-registry two-decade scaling harness (VERDICT r10 item 1):
run EVERY registered query at sf1 and sf10 and merge into one
artifact, in fresh-JVM chunks.

    python tools/run_full_scaling.py [out_path]

Why chunked subprocesses instead of one session: rounds 8-10 proved
that long shared sessions contaminate later measurements (retained
localCheckpoint blocks + JVM heap pressure inflated basket_affinity's
x8.6 into a false x12.5; the clean re-measure is the r10 headline
fix). Fresh JVM per ~40-query chunk bounds that effect to a chunk,
and the known-heavy output-bound anchors (sf1 wall > 8 s in the r10
full-registry artifact — the uncapped pair-emitting dedup family plus
the two iterative graph ops) run ONE PER PROCESS under a hard
timeout, so a super-linear anchor can stall only itself, never the
registry sweep. A timed-out query is recorded as {"timeout": secs}
— that is itself the diagnosis (exact baselines are oracle anchors,
not scale paths; every one has a certified capped/LSH twin).

Each chunk is delegated to tools/bench_scaling.py (same timing
protocol: noop sink, min of 2 runs, adaptive 3rd) with --out to a
per-chunk artifact; this wrapper merges them. Merge is resumable:
existing per-chunk artifacts are reused, so a killed sweep continues
where it left off.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")
SMALL = os.path.join(REPO, ".localdata/sf1")
BIG = os.path.join(REPO, ".localdata/sf10")

# sf1 wall-clock > 8 s in scaling_r10_full_registry_sf01_sf1.json
# (the uncapped pair-emitting dedup anchors + the iterative graph
# ops), PLUS the exact embedding anchors whose per-bucket Arrow/BLAS
# batches grow with corpus size (nearest_neighbor's 500k-query matmul
# crashed the python worker at sf10 in the first r11 sweep attempt —
# the documented BASELINE-ONLY failure mode; isolating them means a
# crash records an error row for that anchor alone).
HEAVY = [
    "basket_communities",
    "cluster_representatives",
    "containment_dup_pairs",
    "cosine_dup_pairs_blocked",
    "dedup_clusters",
    "dedup_summary",
    "dedup_threshold_curve",
    "jaccard_pairs",
    "lsh_recall_summary",
    "product_pagerank",
    "split_leakage_audit",
    "nearest_neighbor",
    "nearest_neighbor_blocked",
    "cosine_dup_pairs",
    "semantic_prune",
    # composes srp_dup_pairs (adaptive SRP; rewritten off the blocked
    # variant in r11) + banded LSH — both members' pair output grows
    # with corpus dup density, so it still dominates its chunk at sf10
    "dedup_agreement",
    # r12: both compose the banded-LSH pair stream (dup_distance folds
    # it to a histogram; the star-contraction CC iterates over it) —
    # pair-graph-sized intermediates, isolate like their LSH siblings
    "dedup_clusters_scalable",
    "dup_distance_profile",
    "cluster_coherence",
]
CHUNK = 40
TIMEOUT_HEAVY = 2400  # hard cap per heavy query (both decades + 2 runs)
TIMEOUT_CHUNK = 5400


def run_chunk(names: list[str], out: str, timeout: int) -> dict:
    if os.path.exists(out):
        with open(out) as fh:
            return json.load(fh)["queries"]
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools/bench_scaling.py"),
        "--queries",
        ",".join(names),
        SMALL,
        BIG,
        "--out",
        out,
    ]
    try:
        subprocess.run(cmd, cwd=REPO, timeout=timeout, check=True)
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT after {timeout}s: {names}", file=sys.stderr)
        return {n: {"timeout": timeout} for n in names}
    except subprocess.CalledProcessError as exc:
        print(f"FAILED rc={exc.returncode}: {names}", file=sys.stderr)
        return {n: {"error": exc.returncode} for n in names}
    with open(out) as fh:
        return json.load(fh)["queries"]


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(ART, "scaling_r13_full_registry_sf1_sf10.json")
    )
    from data_pipeline_example_spark.plans.queries import QUERIES

    # per-chunk artifacts are named after the merged output's stem so a
    # NEW sweep never resumes from a prior round's chunks (chunk i's
    # member list follows the rotated registry order — r11's part0 held
    # different queries than r13's)
    stem = os.path.splitext(os.path.basename(out_path))[0]
    normal = [n for n in QUERIES if n not in frozenset(HEAVY)]
    merged: dict[str, dict] = {}
    chunks = [normal[i : i + CHUNK] for i in range(0, len(normal), CHUNK)]
    for i, names in enumerate(chunks):
        part = os.path.join(ART, f"{stem}_part{i}.json")
        print(f"--- chunk {i + 1}/{len(chunks)} ({len(names)} queries)", file=sys.stderr)
        merged.update(run_chunk(names, part, TIMEOUT_CHUNK))
    for name in HEAVY:
        part = os.path.join(ART, f"{stem}_heavy_{name}.json")
        print(f"--- heavy: {name}", file=sys.stderr)
        merged.update(run_chunk([name], part, TIMEOUT_HEAVY))

    timed = {
        k: v for k, v in merged.items() if "small" in v and v.get("big") is not None
    }
    rec = {
        "metric": "scaling_sf0.1_to_sf1",  # render_md-compatible shape
        "data_factor": 10,
        "small_dir": SMALL,
        "big_dir": BIG,
        "protocol": "fresh JVM per <=40-query chunk; heavy anchors one per "
        f"process, {TIMEOUT_HEAVY}s hard timeout",
        "queries": merged,
        "small_total": round(sum(v["small"] for v in timed.values()), 3),
        "big_total": round(sum(v["big"] for v in timed.values()), 3),
        "n_timed": len(timed),
        "n_total": len(merged),
    }
    rec["total_ratio"] = round(rec["big_total"] / rec["small_total"], 2)
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: rec[k] for k in ("small_total", "big_total", "total_ratio", "n_timed", "n_total")}))


if __name__ == "__main__":
    main()
