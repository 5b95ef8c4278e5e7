"""Similarity search over embedding columns (``array<float>``).

LLM-data-pipeline extensions (BASELINE.json north star; the reference
has no vector operators — every op here is new surface). The search
ladder, exact to compressed:

* ``knn`` — brute-force cosine top-k for one query vector: broadcast the
  query row, score every vector with the UDF-free cosine from
  functions/vectors.py, TakeOrderedAndProject. The correctness baseline;
  at 100 TB it is a single linear scan (fast, but reads everything).
* ``nearest_neighbor_per_vector`` — all-pairs top-1 neighbor. O(n²)
  baseline used for oracle-checking the scale paths.
* ``ivf_knn`` — the scale path: IVF-style bucketed search. Vectors are
  assigned to their nearest centroid once (a broadcast join against the
  centroid set), and a query probes only the ``n_probe`` closest
  centroids' buckets — the scan shrinks by ~n_centroids/n_probe. With a
  pre-materialized assignment table this is a partition-pruned read.
  Centroids here are taken deterministically from the dataset itself
  (first ``n_centroids`` vec_ids) so the operator — and its SQL oracle —
  are fully reproducible without an ML training step.
* ``project_embeddings`` / ``pq_codes`` / ``ivfpq_knn`` — the
  compressed leg: JL random projection (16 doubles stand in for the
  vector during candidate generation), product-quantization codes
  (m small ints stand in for the vector in storage), and IVF-PQ search
  (coarse probe + code-based asymmetric scoring + exact re-rank of a
  short list) — the shape billion-scale ANN systems actually run.

Ordering for top-k uses the 6-dp-rounded cosine plus vec_id tie-break:
double-precision sums can differ in the last ulp across engines, and
ranking on the rounded value keeps result sets cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_example_spark.functions.materialize import materialize

from data_pipeline_example_spark.functions import vectors as V


def valid_embeddings(df: DataFrame, col: str = "embedding") -> DataFrame:
    """COMPUTE-valid embedding rows: present, non-empty, and at least
    one nonzero component (a zero-norm vector has no cosine). Every
    geometry operator funnels through this guard — at 100 TB a corpus
    WILL carry encoder-failure rows, and without the guard they either
    crash the vectorized paths (ragged ``np.vstack``) or poison results
    with NaN cosines. The census operators (``embedding_profile``,
    ``embedding_dimension_health``, ``quantize_embeddings``) deliberately
    see the RAW column — they are how the rejects get counted. Dimension
    UNIFORMITY among valid rows is asserted by
    ``embedding_dimension_health``, not here (it needs an aggregate).
    SQL oracle twin: plans/oracles._EMB_VALID (r15 degenerate sweep)."""
    c = F.col(col)
    return df.filter(
        c.isNotNull() & (F.size(c) > 0) & F.exists(c, lambda x: x != 0.0)
    )


def _as_double(df: DataFrame) -> DataFrame:
    return valid_embeddings(df).select(
        "vec_id", V.to_double_array(F.col("embedding")).alias("v")
    )


def _as_float(df: DataFrame) -> DataFrame:
    """Raw float32 vectors — for Arrow-bound paths: half the transfer
    bytes of the double cast, and float→double widening inside NumPy is
    exact, so downstream float64 math is bit-identical to _as_double."""
    return valid_embeddings(df).select("vec_id", F.col("embedding").alias("v"))


def _with_norm(df: DataFrame) -> DataFrame:
    """vec_id, v, nrm — the L2 norm computed ONCE per vector, below any
    join, so an n²-pair scoring stage pays one dot product per pair
    instead of dot + two norms (3× fewer higher-order-function passes;
    the norms ride through the join as plain scalars)."""
    return _as_double(df).select("vec_id", "v", V.norm(F.col("v")).alias("nrm"))


def knn(embeddings: DataFrame, query_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k neighbors of ``query_id`` (self included).

    BASELINE ONLY — exact single-linear-scan oracle anchor; at corpus
    scale use ``ivf_knn`` (probe-pruned bucketed search, same schema).
    Output: vec_id, cos_sim (6 dp).
    """
    e = _as_double(embeddings)
    # norms factored out of the per-row cosine (r15): the row norm is a
    # projection column below the join (computed once per row) and the
    # query norm a column of the 1-row broadcast build (computed once),
    # so the scored expression dot/(nv·nq) does 64 mult-adds per row
    # instead of 192 — value-identical to cosine() (same fold, same
    # a/(b·c) grouping, same doubles)
    q = e.filter(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), V.norm(F.col("v")).alias("nq")
    )
    return (
        e.select("vec_id", "v", V.norm(F.col("v")).alias("nv"))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                V.dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def nearest_neighbor_per_vector(
    embeddings: DataFrame, method: str = "blocked", n_blocks: int = 16
) -> DataFrame:
    """For every vector: its top-1 neighbor (excluding itself).

    BASELINE ONLY — all-pairs O(n²·d), the exact anchor the approximate
    paths are checked against; at corpus scale use
    ``nearest_neighbor_blocked`` (fixed-k buckets) or
    ``nearest_neighbor_capped`` (adaptive k + hard bucket cap).

    Output: vec_id, nn_id, cos_sim (6 dp).

    ``method="blocked"`` (default): block nested-loop with vectorized
    NumPy scoring. The corpus is hashed into ``n_blocks`` buckets; every
    vector is replicated to each bucket as a query, and one
    ``applyInPandas`` call per bucket computes a (queries × bucket)
    cosine matrix with a single BLAS matmul, emitting per-bucket top-1
    partials that a ``max_by`` aggregate reduces to the global top-1.
    Arrow transfer is (n_blocks+1)·n·d doubles; each bucket's matmul is
    embarrassingly parallel. The O(n²·d) arithmetic runs at BLAS speed
    instead of one interpreted lambda per element — two orders of
    magnitude on wide corpora. (For n where n_blocks·n replication is
    too much, cap the candidate set first — ``ivf_knn``'s assignment —
    then run this within buckets.)

    ``method="fold"``: pure built-in expressions (zip_with + aggregate
    fold per pair) — no Python boundary at all; same results.

    Both shapes: norms computed once per vector, top-1 as a ``max_by``
    hash aggregate with map-side partials — no global sort, no window
    shuffle of n² scored rows. Tie-break (desc cos_sim, asc nn_id) is
    encoded as max over (cos_sim, -nn_id); the rounded cosine is what's
    ranked, keeping the winner cross-engine deterministic.
    """
    best = F.max_by(
        F.struct("nn_id", "cos_sim"), F.struct(F.col("cos_sim"), -F.col("nn_id"))
    ).alias("best")

    if method == "blocked":
        import pandas as pd  # driver/executor-side only

        e = _as_float(embeddings)
        queries = e.select(
            F.explode(F.array(*[F.lit(i) for i in range(n_blocks)])).alias("blk"),
            F.lit(True).alias("is_query"),
            "vec_id",
            "v",
        )
        corpus = e.select(
            F.pmod("vec_id", F.lit(n_blocks)).cast("int").alias("blk"),
            F.lit(False).alias("is_query"),
            "vec_id",
            "v",
        )

        def partial_nn(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            qs = pdf[pdf["is_query"]]
            rs = pdf[~pdf["is_query"]].sort_values("vec_id")  # asc → argmax = lowest id
            if qs.empty or rs.empty:
                return pd.DataFrame({"vec_id": [], "nn_id": [], "cos_sim": []})
            Q = np.vstack(qs["v"].to_numpy()).astype(np.float64)
            R = np.vstack(rs["v"].to_numpy()).astype(np.float64)
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
            S = np.round(Qn @ Rn.T, 6)
            q_ids = qs["vec_id"].to_numpy()
            r_ids = rs["vec_id"].to_numpy()
            # exclude self-matches
            self_mask = q_ids[:, None] == r_ids[None, :]
            S[self_mask] = -np.inf
            j = np.argmax(S, axis=1)  # first max → lowest nn_id on ties
            keep = ~np.isinf(S[np.arange(len(q_ids)), j])
            return pd.DataFrame(
                {
                    "vec_id": q_ids[keep],
                    "nn_id": r_ids[j[keep]],
                    "cos_sim": S[np.arange(len(q_ids)), j][keep],
                }
            )

        partials = queries.unionByName(corpus).groupBy("blk").applyInPandas(
            partial_nn, "vec_id long, nn_id long, cos_sim double"
        )
        return partials.groupBy("vec_id").agg(best).select(
            "vec_id",
            F.col("best.nn_id").alias("nn_id"),
            F.col("best.cos_sim").alias("cos_sim"),
        )

    e = _with_norm(embeddings)
    a = e.select(F.col("vec_id"), F.col("v"), F.col("nrm"))
    b = e.select(
        F.col("vec_id").alias("nn_id"), F.col("v").alias("nv"), F.col("nrm").alias("nnrm")
    )
    scored = a.join(b, F.col("vec_id") != F.col("nn_id")).select(
        "vec_id",
        "nn_id",
        F.round(
            V.dot(F.col("v"), F.col("nv")) / (F.col("nrm") * F.col("nnrm")), 6
        ).alias("cos_sim"),
    )
    return scored.groupBy("vec_id").agg(best).select(
        "vec_id", F.col("best.nn_id").alias("nn_id"), F.col("best.cos_sim").alias("cos_sim")
    )


def assign_centroids(
    embeddings: DataFrame, n_centroids: int = 16, keep_sim: bool = False
) -> DataFrame:
    """Assign each vector to its nearest 'centroid' (cosine, tie-break
    lowest centroid id). Centroids = embeddings with vec_id < n_centroids.
    Output: vec_id, centroid_id (+ cos_sim when ``keep_sim``). The
    centroid set is tiny → broadcast.

    Argmax is a ``min(struct(-cos, cid))`` aggregation, not a window
    rank: min-of-struct is partially aggregable, so the one exchange
    carries ONE narrow row per vector (map-side combined) instead of
    the window's corpus × n_centroids rows sorted per vec_id — the
    difference between shuffling the scored cross product and shuffling
    the answer. Lexicographic struct ordering IS the tie-break
    (-cos asc = cos desc, then cid asc), identical to the rank version
    and to every oracle's ``ORDER BY cos DESC, cid ASC ... rn = 1``.
    """
    e = _as_double(embeddings)
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        F.round(V.cosine(F.col("v"), F.col("cv")), 6).alias("cos_sim"),
    )
    best = scored.groupBy("vec_id").agg(
        F.min(
            F.struct(
                (-F.col("cos_sim")).alias("nc"), F.col("centroid_id").alias("cid")
            )
        ).alias("b")
    )
    out = best.select(
        "vec_id",
        F.col("b.cid").alias("centroid_id"),
        (-F.col("b.nc")).alias("cos_sim"),
    )
    cols = ["vec_id", "centroid_id"] + (["cos_sim"] if keep_sim else [])
    return out.select(*cols)


def n_centroids_for(
    n_rows: int, target_bucket: int = 64, max_centroids: int = 65536
) -> int:
    """Adaptive centroid count: enough centroids that the EXPECTED
    bucket holds ``target_bucket`` rows, clamped to [1, max_centroids].
    SemDeDup-style per-bucket O(size²) work then stays constant as the
    corpus grows (k scales with n) instead of growing quadratically at
    a fixed k — the round-3 verdict's one structural scale gap."""
    import math

    return max(1, min(max_centroids, math.ceil(n_rows / max(target_bucket, 1))))


def _cos_matrix(M, C):
    """Rounded (6 dp) cosine of every row of ``M`` against every row of
    ``C``, float64 — BIT-IDENTICAL to the strict left-to-right fold
    with ``dot / (na * nb)`` normalization (the SQL ``aggregate`` fold
    and DuckDB's ``list_cosine_similarity``), at BLAS speed.

    Hybrid verify-the-boundary scheme: the bulk runs as one
    ``M @ C.T`` matmul (re-associated sums — may differ from the fold
    in the last ulp, ~1e-15 relative), then every entry whose value
    lies within 1e-9 of a 0.5e-6 rounding boundary is recomputed with
    the exact fold recipe (``np.cumsum`` left-to-right, the same order
    as ``srp_dup_pairs``'s pair verification). Away from the band, a
    1e-15 perturbation cannot change ``round(x, 6)``, so BLAS and fold
    round identically; inside the band the fold value is used outright.
    Net: rounded output == fold output EXACTLY for every entry (guard
    test compares against a scalar Python fold), knife-edge centroid
    assignments and keep/drop decisions can never flip between engines,
    and the band is ~2e-3 of entries so the recompute cost is noise
    (the all-cumsum variant measured ~10x slower at sf1 — memory-bound
    rank-3 tensor vs a compute-bound matmul).
    """
    import numpy as np

    # norms via cumsum: exactly the fold's left-to-right accumulation
    na = np.sqrt(np.cumsum(M * M, axis=1)[:, -1])
    nc = np.sqrt(np.cumsum(C * C, axis=1)[:, -1])
    S = (M @ C.T) / (na[:, None] * nc[None, :])
    R = np.round(S, 6)
    frac = np.abs(np.modf(S * 1e6)[0])
    for i, j in zip(*np.where(np.abs(frac - 0.5) < 1e-3)):
        dot = np.cumsum(M[i] * C[j])[-1]
        R[i, j] = np.round(dot / (na[i] * nc[j]), 6)
    return R


def _fine_to_coarse(C_fine, fine_ids, C_coarse, coarse_ids, kc):
    """The deterministic two-level routing table: each FINE centroid's
    coarse group. Fine centroids that ARE coarse centroids (vec_id <
    kc — the coarse set is a prefix of the fine set under the shared
    vec_id rule) route to THEMSELVES (cosine-to-self is 1.0 up to a
    final-ulp wobble; pinning the identity removes the one knife edge
    that could leave a coarse group empty); the rest route to their
    argmax-cosine coarse centroid, 6-dp rounded, lowest coarse_id on
    ties — the exact rule vectors use, so the SQL oracle replays it
    verbatim. Returns ``{coarse_id: (fine_matrix, fine_ids_asc)}``.
    """
    import numpy as np

    routed = np.empty(len(fine_ids), dtype="int64")
    is_self = fine_ids < kc
    routed[is_self] = fine_ids[is_self]
    rest = ~is_self
    if rest.any():
        S = _cos_matrix(C_fine[rest], C_coarse)
        # coarse_ids ascending → argmax first-max = lowest coarse_id
        routed[rest] = coarse_ids[np.argmax(S, axis=1)]
    groups = {}
    for cid in np.unique(routed):
        m = routed == cid
        # fine_ids is ascending, so each group's id list stays ascending
        groups[int(cid)] = (C_fine[m], fine_ids[m])
    return groups


def _capped_assigner(bc_cents):
    """Build the ``mapInPandas`` assigner for
    :func:`assign_centroids_capped` around a BROADCAST handle holding
    ``(C_coarse, coarse_ids, groups)`` — the two-level routing state.

    Per batch: one (batch × kc) cosine matrix routes every vector to
    its coarse group (argmax, 6-dp rounded, lowest-id ties), then one
    (rows × |group|) matrix per coarse group present in the batch
    picks the fine centroid within that group — ~2·√k cosines per row
    instead of the flat path's k (the r7 verdict's measured quadratic:
    k grows with n pre-clamp, so flat assignment was O(n²/target)).

    The matrices ride a torrent broadcast (deserialized once per
    executor), NOT the task closure: at the documented 65536-centroid
    clamp a closure-captured matrix is a multi-hundred-MB pickle
    shipped with every task — a driver-memory and task-dispatch
    bottleneck at exactly the scale the operator targets. The returned
    function's own pickled payload is a few KB regardless of centroid
    count (asserted by test).
    """
    import pandas as pd

    def assign(batches):
        import numpy as np

        C_coarse, coarse_ids, groups = bc_cents.value
        for pdf in batches:
            if pdf.empty:
                continue
            M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            S1 = _cos_matrix(M, C_coarse)
            # coarse_ids ascending by construction → np.argmax's
            # first-max rule = lowest coarse_id on rounded-cosine
            # ties, same as the oracle's ORDER BY cos DESC, id ASC
            routed = coarse_ids[np.argmax(S1, axis=1)]
            cent = np.empty(len(pdf), dtype="int64")
            for cid in np.unique(routed):
                rows = np.where(routed == cid)[0]
                Fm, fids = groups[int(cid)]
                S2 = _cos_matrix(M[rows], Fm)
                cent[rows] = fids[np.argmax(S2, axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "v": pdf["v"],
                    "centroid_id": cent,
                }
            )

    return assign


def assign_centroids_capped(
    embeddings: DataFrame,
    target_bucket: int = 64,
    cap: int = 96,
    n_rows: int | None = None,
) -> DataFrame:
    """Centroid assignment with a HARD per-bucket size bound.

    Two scale fixes over :func:`assign_centroids`:

    * **Adaptive k** — ``n_centroids_for(count, target_bucket)``; the
      corpus row count is one collected scalar (planning-stats-sized,
      the same adaptive idea as AQE), so expected bucket size is
      constant at any corpus scale.
    * **Zero-shuffle, two-level assignment** — the k fine centroids
      (vec_id < k, the same deterministic rule as the fixed-k path)
      are collected once and routed on the driver to kc = ceil(√k)
      COARSE centroids (vec_id < kc — a prefix of the fine set;
      coarse-resident fine centroids route to themselves, the rest to
      their argmax-cosine coarse, 6-dp rounded, lowest-id ties — see
      :func:`_fine_to_coarse`). The coarse matrix plus the per-group
      fine matrices ride ONE torrent **broadcast** (never the task
      closure), and scoring runs inside an Arrow-batched
      ``mapInPandas``: per row, kc coarse cosines pick the group, then
      |group| fine cosines pick the centroid — all with the strict
      left-to-right fold order (:func:`_cos_matrix`), argmax with
      lowest-id tie-break, so every decision matches the SQL oracle
      bit-exactly. **Assignment work per row is kc + |group| ≈ 2·√k
      cosines — sub-linear in n everywhere** (≤ 2·256 at the 65536
      clamp); the r7-measured flat argmax was k = ceil(n/64) cosines
      per row, O(n²·dims/64) total pre-clamp (`knn_density_outliers`
      ×11.6 on ×10 data). Skew caveat: a coarse group can hold more
      than √k fine centroids (routing is data-dependent), so the
      per-row bound is kc + max-group, worst-case kc + k if every fine
      centroid routes to one coarse — the expected cost is √k, the
      hard cap is still ≤ the old flat cost. No n×k row blow-up, no
      per-vector window — the fixed-k path shuffles n·k rows through a
      window; this shuffles nothing.

    Oversized buckets (skewed corpora — many vectors near one centroid)
    are then re-split: ``sub_id = (row_number within bucket − 1) div
    cap`` over a hash-partitioned window, so every (centroid_id,
    sub_id) bucket holds AT MOST ``cap`` rows — a hard bound, not an
    expected one (hash salting) or a best-effort one (recursive
    re-clustering, which preserves more recall but still needs a hard
    fallback; the rank split IS that fallback, kept as the whole
    mechanism because it is deterministic and oracle-expressible).
    Sub-buckets are contiguous vec_id ranges, so the SemDeDup
    earliest-survives order is preserved within each. Buckets at or
    under the cap get sub_id 0 — the split is a no-op until needed.

    Output: vec_id, v (double array), centroid_id, sub_id.
    """
    import math

    import numpy as np

    # planning count over the COMPUTE-VALID rows — k must be derived
    # from the same population the assignment runs on (oracle twin:
    # _CAPPED_SUBBED counts FROM the guarded e)
    n = valid_embeddings(embeddings).count() if n_rows is None else n_rows
    spark = embeddings.sparkSession
    out_schema = "vec_id long, v array<double>, centroid_id long"
    if n == 0:
        return spark.createDataFrame([], out_schema + ", sub_id int")
    k = n_centroids_for(n, target_bucket)
    kc = math.ceil(math.sqrt(k))  # sqrt is correctly-rounded IEEE in
    # both engines, so the oracle's ceil(sqrt(k)) lands on the same kc
    e = _as_double(embeddings)
    cents = e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()
    C_fine = np.vstack([r["v"] for r in cents]).astype(np.float64)
    fine_ids = np.array([r["vec_id"] for r in cents], dtype="int64")
    is_coarse = fine_ids < kc
    C_coarse = C_fine[is_coarse]
    coarse_ids = fine_ids[is_coarse]
    groups = _fine_to_coarse(C_fine, fine_ids, C_coarse, coarse_ids, kc)
    bc_cents = spark.sparkContext.broadcast((C_coarse, coarse_ids, groups))

    assigned = e.mapInPandas(_capped_assigner(bc_cents), out_schema)
    w = Window.partitionBy("centroid_id").orderBy("vec_id")
    # integer `div`, not double `/`+cast: float division of two longs
    # can misround past 2^53 (same reason length_buckets' cuts path
    # avoids it), and the SQL oracle uses integer `// cap`
    return (
        assigned.withColumn("rn", F.row_number().over(w))
        .withColumn("sub_id", F.expr(f"cast((rn - 1) div {cap} as int)"))
        .drop("rn")
    )


def semantic_prune_capped(
    embeddings: DataFrame,
    threshold: float = 0.35,
    target_bucket: int = 64,
    cap: int = 96,
    n_rows: int | None = None,
) -> DataFrame:
    """:func:`semantic_prune` with bounded per-bucket work — the 100 TB
    shape. Centroid count adapts to corpus size and every similarity
    matrix is at most cap×cap (see :func:`assign_centroids_capped`), so
    per-task time AND memory are constant in corpus size; total work is
    O(n·(√k + cap)·dims) — the two-level assignment term (≈2√k cosines
    per row, ≤512 at the 65536-centroid clamp) plus the capped
    per-bucket dedup — instead of fixed-k's O(n²/k) bucket blow-up or
    the r7 flat assignment's O(n·k) scoring. Recall tradeoff:
    a near-dup pair straddling two sub-buckets of the same centroid is
    missed (exactly the tradeoff the fixed-k operator already makes
    across centroid buckets, applied one level down).

    Output: vec_id, centroid_id, sub_id, keep, n_earlier_dups, max_cos
    — the fixed-k schema plus the sub-bucket id, so the bound is
    auditable downstream. ``n_rows``: pass the corpus row count when
    the caller already knows it (a composed pipeline) to skip this
    operator's one planning ``count()`` job.
    """
    import pandas as pd

    bucketed = assign_centroids_capped(embeddings, target_bucket, cap, n_rows)

    def bucket_prune(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.vstack(pdf["v"].to_numpy()[order]).astype(np.float64)
        S = _cos_matrix(M, M)  # fold-order bit-exact with the oracle
        hit = np.tril(S >= threshold, k=-1)
        n_dups = hit.sum(axis=1)
        masked = np.where(hit, S, -np.inf)
        max_cos = pd.array(masked.max(axis=1, initial=-np.inf), dtype="Float64")
        max_cos[n_dups == 0] = pd.NA
        return pd.DataFrame(
            {
                "vec_id": ids,
                "centroid_id": pdf["centroid_id"].to_numpy()[order].astype("int64"),
                "sub_id": pdf["sub_id"].to_numpy()[order].astype("int32"),
                "keep": (n_dups == 0).astype("int32"),
                "n_earlier_dups": n_dups.astype("int64"),
                "max_cos": max_cos,
            }
        )

    return bucketed.groupBy("centroid_id", "sub_id").applyInPandas(
        bucket_prune,
        "vec_id long, centroid_id long, sub_id int, keep int, "
        "n_earlier_dups long, max_cos double",
    )


def nearest_neighbor_capped(
    embeddings: DataFrame,
    target_bucket: int = 64,
    cap: int = 96,
    n_rows: int | None = None,
) -> DataFrame:
    """:func:`nearest_neighbor_blocked` with adaptive centroid count and
    a hard per-bucket cap (see :func:`assign_centroids_capped`): every
    per-bucket cosine matrix is at most cap×cap, total work
    O(n·(√k + cap)·dims) — two-level assignment plus the capped
    per-bucket scan — at any corpus size. Recall approximate (neighbor must share the
    sub-bucket), precision exact; singleton sub-buckets emit no row,
    matching the SQL oracle. ``n_rows``: pass when known to skip the
    planning ``count()`` job. Output: vec_id, nn_id, cos_sim (6 dp).
    """
    import pandas as pd

    bucketed = assign_centroids_capped(embeddings, target_bucket, cap, n_rows)

    def bucket_nn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id")  # asc → argmax = lowest nn_id on ties
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": [], "nn_id": [], "cos_sim": []})
        M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        S = _cos_matrix(M, M)  # fold-order bit-exact with the oracle
        np.fill_diagonal(S, -np.inf)
        ids = pdf["vec_id"].to_numpy()
        j = np.argmax(S, axis=1)
        return pd.DataFrame(
            {"vec_id": ids, "nn_id": ids[j], "cos_sim": S[np.arange(len(ids)), j]}
        )

    return bucketed.groupBy("centroid_id", "sub_id").applyInPandas(
        bucket_nn, "vec_id long, nn_id long, cos_sim double"
    )


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    method: str = "blocked",
    n_blocks: int = 16,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b).

    All-pairs exact scoring, kept when >= threshold. Output: vec_a,
    vec_b, cos_sim (6 dp). ``method="blocked"`` (default) runs the n²·d
    arithmetic as per-bucket NumPy matmuls (same block nested-loop shape
    as ``nearest_neighbor_per_vector``): each unordered pair is scored
    exactly once — in the corpus-block of its higher vec_id — so no
    dedup pass is needed. ``method="fold"`` is the pure-expression twin.
    Exact recall either way; for approximate-recall candidate pruning at
    corpus scale see ``cosine_dup_pairs_blocked`` (centroid buckets).
    """
    if method == "blocked":
        import pandas as pd

        e = _as_float(embeddings)
        queries = e.select(
            F.explode(F.array(*[F.lit(i) for i in range(n_blocks)])).alias("blk"),
            F.lit(True).alias("is_query"),
            "vec_id",
            "v",
        )
        corpus = e.select(
            F.pmod("vec_id", F.lit(n_blocks)).cast("int").alias("blk"),
            F.lit(False).alias("is_query"),
            "vec_id",
            "v",
        )

        def partial_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            qs = pdf[pdf["is_query"]]
            rs = pdf[~pdf["is_query"]]
            if qs.empty or rs.empty:
                return pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
            Q = np.vstack(qs["v"].to_numpy()).astype(np.float64)
            R = np.vstack(rs["v"].to_numpy()).astype(np.float64)
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            Rn = R / np.linalg.norm(R, axis=1, keepdims=True)
            S = np.round(Qn @ Rn.T, 6)
            q_ids = qs["vec_id"].to_numpy()
            r_ids = rs["vec_id"].to_numpy()
            qi, ri = np.where((S >= threshold) & (q_ids[:, None] < r_ids[None, :]))
            return pd.DataFrame(
                {"vec_a": q_ids[qi], "vec_b": r_ids[ri], "cos_sim": S[qi, ri]}
            )

        return queries.unionByName(corpus).groupBy("blk").applyInPandas(
            partial_pairs, "vec_a long, vec_b long, cos_sim double"
        )

    e = _with_norm(embeddings)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_dup_pairs_blocked(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: candidates limited to pairs
    assigned to the same centroid bucket, so the join is an equi-join on
    centroid_id instead of an all-pairs cross product — per-bucket cost
    is (n/k)² and buckets shuffle independently. Recall is approximate
    (a pair straddling two buckets is missed); precision exact.
    Callers that already hold the centroid assignment (``semantic_prune``)
    pass it via ``assigned`` so it is computed once. Fixed k is the
    oracle-stable registered shape; at corpus scale derive k with
    :func:`n_centroids_for` (or use the hard-capped assignment of
    :func:`assign_centroids_capped`) so per-bucket work stays bounded.
    """
    e = _with_norm(embeddings)
    if assigned is None:
        assigned = assign_centroids(embeddings, n_centroids)
    assigned = assigned.select("vec_id", "centroid_id")
    # both sides of the block self-join read the normed+assigned frame —
    # materialize once so the corpus is scanned and assigned once, not
    # once per side (PLANS.md scans column: 12 → 0 + 1 construction)
    ea = e.join(assigned, "vec_id").transform(materialize)
    a = ea.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "centroid_id",
    )
    b = ea.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "centroid_id",
    )
    return (
        a.join(b, ["centroid_id"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(
                V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_prune(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_centroids: int = 16,
    method: str = "blocked",
) -> DataFrame:
    """SemDeDup-style semantic deduplication decision per vector: inside
    each centroid bucket, a vector is DROPPED when any earlier vector
    (lower vec_id, same bucket) is cosine-similar above ``threshold``;
    the earliest member of every near-dup group survives (Abbas et al.,
    SemDeDup — the declarative, non-iterative keep rule).

    ``method="blocked"`` (default): one shuffle keyed on centroid_id,
    then per-bucket BLAS — each bucket's (n/k)² similarity matrix is a
    single float64 matmul inside Arrow-batched ``applyInPandas``, and
    the per-vector (count, max) rollup happens in the same batch, so
    no pair list is ever materialized or shuffled. np.round(·, 6)
    applies the same float64 rounding as the expression path; the BLAS
    matmul accumulates in a different order than the sequential fold,
    so knife-edge values could in principle differ in the last ulp
    before rounding — in practice the 6-dp results match the oracle on
    every certified run. ``method="fold"`` is the
    pure-expression twin: pairs from ``cosine_dup_pairs_blocked`` + one
    aggregation — same result, JVM-only, but it shuffles vectors into a
    self-join and evaluates a d-dim fold per pair.

    Output: vec_id, centroid_id, keep (1/0 — int for cross-engine hash
    parity), n_earlier_dups, max_cos (max_cos NULL for kept vectors —
    nothing above threshold to report).

    Fixed ``n_centroids`` keeps this entry oracle-stable; the 100 TB
    path is :func:`semantic_prune_capped` — adaptive k + a hard
    per-bucket cap + two-level assignment, total work
    O(n·(√k + cap)·dims) instead of O(n²/k).
    """
    assigned = assign_centroids(embeddings, n_centroids)
    if method == "blocked":
        import pandas as pd

        bucketed = _as_float(embeddings).join(assigned, "vec_id")

        def bucket_prune(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            ids = pdf["vec_id"].to_numpy()
            order = np.argsort(ids)
            ids = ids[order]
            V = np.vstack(pdf["v"].to_numpy()[order]).astype(np.float64)
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = np.round(Vn @ Vn.T, 6)
            hit = np.tril(S >= threshold, k=-1)  # row j vs earlier cols i<j
            n_dups = hit.sum(axis=1)
            masked = np.where(hit, S, -np.inf)
            # explicit nullable Float64 with pd.NA for kept vectors —
            # the NULL contract is stated in the dtype, not left to
            # Arrow's NaN→NULL coercion of a float64 ndarray
            max_cos = pd.array(masked.max(axis=1, initial=-np.inf), dtype="Float64")
            max_cos[n_dups == 0] = pd.NA
            return pd.DataFrame(
                {
                    "vec_id": ids,
                    "centroid_id": pdf["centroid_id"].to_numpy()[order].astype("int64"),
                    "keep": (n_dups == 0).astype("int32"),
                    "n_earlier_dups": n_dups.astype("int64"),
                    "max_cos": max_cos,
                }
            )

        return bucketed.groupBy("centroid_id").applyInPandas(
            bucket_prune,
            "vec_id long, centroid_id long, keep int, n_earlier_dups long, max_cos double",
        )
    pairs = cosine_dup_pairs_blocked(embeddings, threshold, n_centroids, assigned)
    dropped = pairs.groupBy(F.col("vec_b").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("n_earlier_dups"),
        F.round(F.max("cos_sim"), 6).alias("max_cos"),
    )
    return assigned.join(dropped, "vec_id", "left").select(
        "vec_id",
        "centroid_id",
        F.col("n_earlier_dups").isNull().cast("int").alias("keep"),
        F.coalesce("n_earlier_dups", F.lit(0)).cast("long").alias("n_earlier_dups"),
        "max_cos",
    )


def embedding_prototypes(
    embeddings: DataFrame, per_bucket: int = 8, n_centroids: int = 16
) -> DataFrame:
    """Cluster-stratified prototype selection: the ``per_bucket`` most
    central vectors (highest cosine to their assigned centroid) from
    every centroid bucket — the prototypicality ranking data-pruning
    curricula sort by (Sorscher et al.: keep prototypes for small
    budgets, hard examples for large ones; flip the ordering for the
    latter).

    Two window passes, both over naturally small partitions: the
    assignment window groups k rows per vec_id, the ranking window
    ~n/k rows per bucket — at 100 TB swap the ranking window for a
    per-bucket top-m aggregate if buckets grow beyond task memory.
    Output: vec_id, centroid_id, cos_centroid, rank.
    """
    assigned = assign_centroids(embeddings, n_centroids, keep_sim=True)
    w = Window.partitionBy("centroid_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_bucket)
        .select(
            "vec_id",
            "centroid_id",
            F.col("cos_sim").alias("cos_centroid"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def nearest_neighbor_blocked(
    embeddings: DataFrame, n_centroids: int = 16
) -> DataFrame:
    """IVF-blocked hybrid NN — the scale-safe all-corpus neighbor search
    promised in ``nearest_neighbor_per_vector``'s docstring: candidates
    come from the centroid assignment (the same index ``ivf_knn`` probes),
    and scoring runs as one BLAS matmul per centroid bucket.

    Per-bucket cost is O((n/k)²·d) instead of the exact baseline's
    O(n²·d); buckets shuffle and compute independently, and no vector is
    replicated (each row is Arrow-transferred exactly once), so the shape
    survives a 100×-corpus scale-up by raising ``n_centroids``. Recall is
    approximate — a vector whose true neighbor lives in another bucket
    gets its best same-bucket neighbor — precision exact. Singleton
    buckets emit no row (no candidate exists), matching the SQL oracle.
    Fixed k is the oracle-stable shape; :func:`nearest_neighbor_capped`
    adds adaptive k + a hard bucket cap for unbounded corpora.

    Output: vec_id, nn_id, cos_sim (6 dp). Tie-break: ranked on the
    6-dp-rounded cosine, lowest nn_id wins (rows sorted asc, first
    argmax), cross-engine deterministic.
    """
    import pandas as pd  # driver/executor-side only

    e = _as_float(embeddings)
    assigned = assign_centroids(embeddings, n_centroids)
    bucketed = e.join(assigned, "vec_id")

    def bucket_nn(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id")  # asc → argmax = lowest nn_id on ties
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": [], "nn_id": [], "cos_sim": []})
        M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = np.round(Mn @ Mn.T, 6)
        np.fill_diagonal(S, -np.inf)
        ids = pdf["vec_id"].to_numpy()
        j = np.argmax(S, axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "nn_id": ids[j],
                "cos_sim": S[np.arange(len(ids)), j],
            }
        )

    return bucketed.groupBy("centroid_id").applyInPandas(
        bucket_nn, "vec_id long, nn_id long, cos_sim double"
    )


def _pynorm(vec) -> float:
    """Driver-side L2 norm, BIT-IDENTICAL to ``V.norm``'s expression:
    the same left-to-right ``acc + x·x`` fold over the same doubles
    (IEEE-754 add/mul are correctly rounded and deterministic in both
    runtimes; CPython floats ARE doubles) followed by a correctly-
    rounded sqrt. No decimal rounding is involved anywhere — the
    engine-vs-Python divergence class lives in ``round()``'s
    decimal-string HALF_UP, which norms never touch. Pinned equal to
    the engine on real + adversarial corpora by test."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + x * x
    return math.sqrt(acc)


def _dmat_sql(vecs) -> Column:
    """One parsed SQL literal for a list of double vectors (array of
    array<double>) — ``CAST('<repr>' AS DOUBLE)`` round-trips the exact
    double, and a single ``expr()`` parse replaces O(rows × dims) py4j
    literal Columns (the ivf_knn plan-build discipline)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in v) + ")"
            for v in vecs
        )
        + ")"
    )


def _ids_sql(ids) -> Column:
    """Long-array SQL literal (companion of :func:`_dmat_sql`)."""
    return F.expr("array(" + ",".join(f"{int(i)}L" for i in ids) + ")")


def _norms_sql(norms) -> Column:
    """Double-array SQL literal of ENGINE-computed norms (collected
    from a bounded local job running ``V.norm`` itself, so the doubles
    are bit-identical to an in-plan ``norm()``; ``CAST('<repr>' AS
    DOUBLE)`` round-trips them exactly)."""
    return F.expr(
        "array(" + ",".join(f"CAST('{x!r}' AS DOUBLE)" for x in norms) + ")"
    )


def _let(binds: dict, body) -> Column:
    """Lambda-let: evaluate each bind ONCE per row and hand them to
    ``body`` as lambda-variable struct fields. Loop-invariant
    subexpressions (norms, slices) referenced inside higher-order-
    function lambdas are otherwise re-evaluated PER ELEMENT: HOF bodies
    run interpreted (CodegenFallback) with no common-subexpression
    elimination, and CollapseProject inlines single-use projection
    aliases straight into the lambda body — a projection column is NOT
    a safe hoist. A lambda VARIABLE is: the optimizer cannot substitute
    through it, so ``transform`` over a one-element struct array is the
    expression-level `let`. Measured ×1.4–2 on the literal-centroid
    assignment at sf0.1, bit-identical results."""
    s = F.array(F.struct(*[c.alias(k) for k, c in binds.items()]))
    return F.element_at(F.transform(s, body), 1)


def _inline_best(vcol: Column, cent_rows, cent_norms, nv: Column) -> Column:
    """Scan-local nearest-centroid struct over literal centroids — the
    ``assign_centroids`` argmax verbatim (min over (-cos, cid) structs,
    6-dp rounding) as a per-row expression: ZERO exchanges instead of a
    corpus-sized aggregate. ``cent_rows`` must be (cid, vec) pairs
    sorted by cid ascending; ``cent_norms`` their engine-computed norms
    (same order); ``nv`` a let-bound column holding ``V.norm(vcol)``.
    The score is ``dot/(nv·nc)`` — value-identical to
    ``cosine = dot/(norm(a)·norm(b))`` (same fold, same grouping, norms
    the same doubles) but the row norm is computed once per ROW instead
    of once per centroid, and the centroid norms are constants.
    Returns the winning struct; read ``.getField("cid")``."""
    cmat = _dmat_sql([cv for _, cv in cent_rows])
    cids = _ids_sql([cid for cid, _ in cent_rows])
    nlits = _norms_sql(cent_norms)
    idx = F.sequence(F.lit(0), F.lit(len(cent_rows) - 1))
    return F.array_min(
        F.transform(
            idx,
            lambda i: F.struct(
                (
                    -F.round(
                        V.dot(vcol, F.element_at(cmat, i + 1))
                        / (nv * F.element_at(nlits, i + 1)),
                        6,
                    )
                ).alias("nc"),
                F.element_at(cids, i + 1).alias("cid"),
            ),
        )
    )


def _probe_sorted(rows, qid=None):
    """Driver-side probe ranking over collected kind-0 rows: (c DESC
    NULLS LAST, cid ASC) — the engine's ``desc`` ordering exactly, so a
    zero-norm centroid/query cosine (NULL ``c``) is simply never probed
    (the r14 degrade) instead of raising TypeError on ``-None`` (r16,
    per ADVICE)."""
    return sorted(
        (
            (r["c"], r["cid"])
            for r in rows
            if r["kind"] == 0 and (qid is None or r["qid"] == qid)
        ),
        key=lambda t: (t[0] is None, -(t[0] or 0.0), t[1]),
    )


def _head_scored_fetch(
    e: DataFrame,
    head_pred: Column,
    q_pred: Column,
    n_centroids: int,
    ks: int | None = None,
    m: int = 0,
    sub_len: int = 0,
    q_max: int | None = None,
    head_max: int = 0,
) -> dict:
    """ONE bounded construct job replacing the separate head collect and
    the probe/LUT LocalRelation job (r16): the raw head rows (kind 2)
    and the engine-rounded probe/LUT cosines (kind 0 = centroid ×
    query, kind 1 = codebook-slice × query-slice) are sibling union
    legs of a single plan over the pushdown-filtered embeddings scan,
    collected once. Engine round/cosine semantics are identical to the
    r15 LocalRelation job — same ``F.round(V.cosine(...), 6)`` fold
    over the same doubles, which now come straight from the scan
    instead of a collect→createDataFrame round-trip (Python floats ARE
    the parquet doubles, so the values cannot differ). Row count is
    n_centroids·|q| + m·ks·|q| + |head| — bounded by the parameters,
    never the corpus.

    Returns a bundle dict carrying the collected ``rows``, the raw
    ``by_id`` head map, and the parameters the fetch was built with —
    consumers VALIDATE those instead of trusting the caller (the
    silent-shrink hazard the r15 ADVICE flagged)."""
    _nl = F.lit(None).cast("long")
    _nd = F.lit(None).cast("double")
    _nv = F.lit(None).cast("array<double>")
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    qs = e.filter(q_pred).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    k0 = cents.join(F.broadcast(qs)).select(
        F.lit(0).alias("kind"),
        F.col("qid"),
        F.lit(-1).alias("g"),
        F.col("cid"),
        F.round(V.cosine(F.col("cv"), F.col("qv")), 6).alias("c"),
        V.norm(F.col("cv")).alias("na"),
        V.norm(F.col("qv")).alias("nq"),
        _nl.alias("vid"),
        _nv.alias("v"),
    )
    legs = [k0]
    if ks is not None:
        cb = e.filter(F.col("vec_id") < ks).select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
        gc = F.col("g")

        def _sl(col):
            return F.slice(col, gc * sub_len + 1, F.lit(sub_len))

        k1 = (
            cb.join(F.broadcast(qs))
            .select(
                "cid",
                "cv",
                "qid",
                "qv",
                F.explode(F.lit(list(range(m)))).alias("g"),
            )
            .select(
                F.lit(1).alias("kind"),
                F.col("qid"),
                gc,
                F.col("cid"),
                F.round(V.cosine(_sl(F.col("cv")), _sl(F.col("qv"))), 6).alias(
                    "c"
                ),
                V.norm(_sl(F.col("cv"))).alias("na"),
                _nd.alias("nq"),
                _nl.alias("vid"),
                _nv.alias("v"),
            )
        )
        legs.append(k1)
    k2 = e.filter(head_pred).select(
        F.lit(2).alias("kind"),
        _nl.alias("qid"),
        F.lit(-1).alias("g"),
        _nl.alias("cid"),
        _nd.alias("c"),
        _nd.alias("na"),
        _nd.alias("nq"),
        F.col("vec_id").alias("vid"),
        F.col("v").alias("v"),
    )
    legs.append(k2)
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    rows = out.collect()
    by_id = {
        int(r["vid"]): [float(x) for x in r["v"]]
        for r in rows
        if r["kind"] == 2
    }
    return {
        "rows": rows,
        "by_id": by_id,
        "n_centroids": int(n_centroids),
        "ks": None if ks is None else int(ks),
        "m": int(m),
        "q_max": q_max,
        "head_max": int(head_max),
    }


def _check_fetch(fetch: dict, *, n_centroids, ks, m, q_max, need) -> None:
    """Reject a shared fetch bundle whose build parameters don't cover
    this callee's — the r15 pass-through trusted the caller and a
    default drift would have silently shrunk cent/cb/query rows (r15
    ADVICE). Raises instead of asserting so the guard survives -O."""
    bad = fetch["n_centroids"] != int(n_centroids)
    bad = bad or (ks is not None and fetch["ks"] != int(ks))
    bad = bad or (m and fetch["m"] != int(m))
    bad = bad or (
        q_max is not None
        and (fetch["q_max"] is None or fetch["q_max"] < int(q_max))
    )
    bad = bad or fetch["head_max"] < int(need)
    if bad:
        raise ValueError(
            f"shared head fetch built with {({k: fetch[k] for k in ('n_centroids', 'ks', 'm', 'q_max', 'head_max')})} "
            f"does not cover callee params n_centroids={n_centroids}, "
            f"ks={ks}, m={m}, q_max={q_max}, need={need}"
        )


def ivf_knn(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-style approximate top-k: probe only the n_probe buckets whose
    centroids are closest to the query. Output: vec_id, cos_sim (6 dp).

    Serving plan: ONE corpus scan, zero exchanges — assignment is an
    inline min(struct(-cos, cid)) expression over the broadcast-literal
    centroids (the ``assign_centroids`` tie-break verbatim), the probe
    filter is scan-local, and top-k is a TakeOrdered. The only driver
    materialization is the (n_centroids + 1)-row centroid/query fetch —
    bounded by the parameter, not the corpus. At scale the same layout
    is served from ``write_ann_index``'s centroid-partitioned files
    with partition pruning (``ivfpq_knn_indexed``).

    Contract note: unlike the lazy operators, this one runs eager
    Spark jobs at DataFrame-CONSTRUCTION time (the centroid/query
    fetch and the n_centroids-row probe ranking) — callers that need
    a fully lazy plan should serve from ``ivfpq_knn_indexed``. The
    centroid matrix is emitted as ONE parsed SQL literal (the simhash
    SQL-string discipline) so plan construction stays linear and
    JVM-side instead of building O(n_centroids × dims) py4j Column
    objects.
    """
    e = _as_double(embeddings)
    # head rows AND the probe scoring in ONE bounded job (r16): the
    # probe selection previously ran as a second LocalRelation job so
    # round/cosine semantics were engine-exact; the fused fetch keeps
    # the engine semantics (same expressions, in-plan over the pushed-
    # down scan legs) while collecting head vectors, probe cosines and
    # norms together. (r15 NOTE stands: a lazy broadcast-semi-join
    # probe was tried and REVERTED — the scan-local isin literal
    # filter is free at exec, and the per-action broadcast build cost
    # more than the tiny probe job saved; r16 removes that job without
    # changing the exec shape.)
    fetch = _head_scored_fetch(
        e,
        (F.col("vec_id") < n_centroids) | (F.col("vec_id") == query_id),
        F.col("vec_id") == query_id,
        n_centroids,
        head_max=n_centroids,
    )
    by_id = fetch["by_id"]
    if query_id not in by_id:
        return e.select(
            "vec_id", F.lit(0.0).alias("cos_sim")
        ).limit(0)
    qv = by_id[query_id]
    qlit = F.array(*[F.lit(x) for x in qv])
    cent_rows = [
        (int(cid), by_id[cid]) for cid in sorted(by_id) if cid < n_centroids
    ]
    if not cent_rows:
        # no vec_id below n_centroids: nothing to probe — empty result,
        # same contract as the missing-query path
        return e.select("vec_id", F.lit(0.0).alias("cos_sim")).limit(0)
    probe_scores = _probe_sorted(fetch["rows"])
    probed = [cid for _, cid in probe_scores[: int(n_probe)]]
    nmap = {r["cid"]: r["na"] for r in fetch["rows"] if r["kind"] == 0}
    cent_norms = [nmap[cid] for cid, _ in cent_rows]
    nq = next(r["nq"] for r in fetch["rows"] if r["kind"] == 0)
    nq_lit = F.expr(f"CAST('{nq!r}' AS DOUBLE)")
    # inline assignment: argmax over the centroid literals via
    # min(struct(-cos, cid)) — the assign_centroids tie-break verbatim,
    # but as a scan-local expression, so the corpus is read ONCE with
    # ZERO exchanges and top-k is a TakeOrdered (the previous plan
    # shuffled full vectors through a corpus-sized vec_id join: the one
    # super-linear scaler of the r5 sf1 pass, x12 on x10 data).
    # The centroid matrix + id list go through ONE parsed SQL string
    # each: CAST('<repr>' AS DOUBLE) round-trips the exact double, and
    # a single expr() parse replaces n_centroids × dims py4j literal
    # Columns (driver plan-build was quadratic-ish at the 65536 clamp).
    # The row norm is let-bound (computed once per row, not once per
    # centroid — see _let) and centroid/query norms ride as engine-
    # computed literals from the probe job: the score dot/(nv·nc) is
    # value-identical to cosine() while cutting per-row work ~3×.
    cid_col = _let(
        {"nv": V.norm(F.col("v"))},
        lambda s: _inline_best(F.col("v"), cent_rows, cent_norms, s["nv"]),
    ).getField("cid")
    return (
        e.withColumn("cid", cid_col)
        .filter(F.col("cid").isin(probed))
        .select(
            "vec_id",
            F.round(
                V.dot(F.col("v"), qlit) / (V.norm(F.col("v")) * nq_lit), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_centroids(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Per-bucket centroid statistics over the embedding column — the
    aggregate-a-vector-column pattern (mean vector per group), expressed
    as posexplode → per-component avg → recompose. Component averages
    are rounded to 6 dp before the norm so cross-engine float-sum order
    can't flip the result. Shuffles carry (bucket, pos, partial-sum)
    triples, never whole vectors. Output: bucket, n_vecs, centroid_norm.
    """
    ex = _as_double(embeddings).select(
        (F.col("vec_id") % k).alias("bucket"),
        F.posexplode("v").alias("pos", "val"),
    )
    comp = ex.groupBy("bucket", "pos").agg(F.round(F.avg("val"), 6).alias("m"))
    norms = comp.groupBy("bucket").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("centroid_norm")
    )
    counts = (
        _as_double(embeddings)
        .groupBy((F.col("vec_id") % k).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    return (
        counts.join(norms, "bucket")
        .select("bucket", "n_vecs", "centroid_norm")
        .orderBy("bucket")
    )


def embedding_profile(embeddings: DataFrame) -> DataFrame:
    """Per-label embedding-space profile: vector count and L2-norm
    distribution (mean/min/max) for every label — the drift monitor a
    production embedding pipeline runs per batch (collapsed norms flag
    a dead encoder; a drifting mean flags distribution shift).

    Norms are computed once in a projection (`_with_norm`), then it is
    one |labels|-group aggregation — map-side combinable, the vectors
    themselves never shuffle. Output: label, n_vectors, avg_norm,
    min_norm, max_norm.
    """
    e = embeddings.select(
        "label", V.norm(V.to_double_array(F.col("embedding"))).alias("nrm")
    )
    return (
        e.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
        .orderBy("label")
    )


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 quantization summary — the storage-side
    companion of similarity search: at corpus scale embeddings ship and
    sit quantized (4× smaller than float32, 8× than float64), and this
    operator computes the quantization deterministically in pure column
    expressions (no UDF, single scan, no shuffle).

    scale = round(127 / max|v_i|, 6) (rounded BEFORE use so both engines
    multiply by the identical double); q_i = floor(v_i·scale + 0.5) —
    explicit round-half-up, portable across engines unlike bankers'
    rounding. The query returns the audit row (scale + quantized
    sum/min/max), not the byte arrays, so the result is fixed-width;
    zero vectors quantize to all-zero with scale 0. Output: vec_id,
    scale, q_sum, q_min, q_max.
    """
    # CENSUS semantics: every row is summarized, degenerates included
    # (NULL vector → NULL q_*, empty vector → scale 0 / q_sum 0), so
    # this reads the RAW column, not the valid_embeddings funnel
    e = embeddings.select(
        "vec_id", V.to_double_array(F.col("embedding")).alias("v")
    )
    max_abs = F.array_max(F.transform("v", lambda x: F.abs(x)))
    # scale materialized in a lower projection so the transform below
    # references the bound column, not a duplicated max/divide subtree
    base = e.select(
        "vec_id",
        "v",
        F.when(max_abs > 0, F.round(F.lit(127.0) / max_abs, 6))
        .otherwise(F.lit(0.0))
        .alias("scale"),
    )
    withq = base.select(
        "vec_id",
        "scale",
        F.transform(
            "v", lambda x: F.floor(x * F.col("scale") + 0.5).cast("long")
        ).alias("q"),
    )
    return withq.select(
        "vec_id",
        "scale",
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
    )


def kmeans_embeddings(
    embeddings: DataFrame, k: int = 8, iterations: int = 5
) -> DataFrame:
    """K-means over the embedding column with pure DataFrame ops — the
    iterative-refinement workload class (like the connected-components
    operator, driver-side loop over distributed steps; no MLlib, no
    UDFs in the assignment step).

    Initialization is deterministic (the k lowest vec_ids seed the
    centroids). Each iteration: (a) assign — crossJoin against the
    broadcast centroid table, squared-L2 via ``F.aggregate(zip_with)``,
    argmin with one ``min_by``; (b) update — per-cluster component
    means via posexplode (shuffles carry (cluster, pos, sum) scalars,
    never vectors). The k-row centroid checkpoint truncates each
    iteration's lineage. Not SQL-expressible in one query → rows-only check; the
    unit test asserts inertia is monotonically non-increasing.
    Output: cluster, n_vecs, inertia (2 dp).
    """
    vecs = _as_double(embeddings).transform(materialize)
    centroids = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cluster"),
            F.col("v").alias("c"),
        )
        .transform(materialize)
    )
    # 6-dp rounding on BOTH the distance and the updated component
    # means makes every iteration's argmin/average engine-deterministic
    # — the contract that lets the DuckDB oracle replay the whole
    # refinement as an unrolled CTE chain (this op used to be the
    # rows-only entry; the rounding is what upgraded it to hash-exact)
    sqdist = F.round(
        F.aggregate(
            F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    # per-iteration job shape (r15): the ASSIGNMENT frame stays lazy —
    # the k-row centroid checkpoint already truncates lineage, so each
    # round's assignment computes INSIDE the next centroid update's
    # blocking job (one job per round, not two, and no corpus-sized
    # assigned blocks written per round). The LAST round's centroid
    # update is skipped outright: nothing reads it (the old form paid a
    # full posexplode aggregate job whose result was dropped). Blocking
    # jobs: 2 + (iterations − 1), was 2 + 2·iterations.
    assigned = None
    for it in range(iterations):
        scored = vecs.crossJoin(F.broadcast(centroids)).select(
            "vec_id", "v", "cluster", sqdist.alias("d2")
        )
        assigned = (
            scored.groupBy("vec_id")
            .agg(
                F.min_by("cluster", F.struct("d2", "cluster")).alias("cluster"),
                F.min("d2").alias("d2"),
            )
            .join(vecs, "vec_id")
        )
        if it == iterations - 1:
            break
        comp = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
        )
        centroids = (
            comp.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster",
                F.expr("transform(pm, x -> x.m)").alias("c"),
            )
            .transform(materialize)
        )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.sum("d2"), 2).alias("inertia"),
        )
        .orderBy("cluster")
    )


def _srp_signs(n_bits: int, dims: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix for signed random projections.

    Component (j, i) is +1 when the first hex digit of md5("j:i") is
    < 8, else −1 — a Rademacher vector family derived from a public
    hash, so the same hyperplanes are reproducible in any engine (the
    oracle embeds the identical literals) without shipping an RNG seed
    or a trained artifact.
    """
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) < 8 else -1.0
            for i in range(dims)
        ]
        for j in range(n_bits)
    ]


def srp_signature_expr(
    vec_col: str = "embedding", n_bits: int = 16, dims: int = 64
) -> str:
    """SQL expression string computing the full ``n_bits``-bit SRP
    signature of a vector column as ONE bigint — the property that makes
    hyperplane LSH the streaming-ingest dedup key: the hyperplanes are
    fixed (md5-derived, the same family ``srp_dup_pairs`` banks on), so
    the signature is a pure per-row expression with NO corpus statistics,
    no fitted centroids, and no state — it can be computed on a
    micro-batch row the moment it arrives, or precomputed once and
    stored beside the corpus as an 8-byte column.

    Identical vectors and near-parallel vectors (within ~1/2^bits of the
    angular space) share the signature; ``streaming/curation.py`` keys
    ``dropDuplicatesWithinWatermark`` on it for bounded-state embedding
    near-dup admission.
    """
    signs = _srp_signs(n_bits, dims)
    terms = []
    for j in range(n_bits):
        arr = ", ".join(f"{s:.1f}D" for s in signs[j])
        bit = (
            f"round(aggregate(zip_with(cast({vec_col} as array<double>), "
            f"array({arr}), (x, y) -> x * y), 0.0D, (acc, x) -> acc + x), 6) >= 0"
        )
        terms.append(f"cast({bit} as bigint) * {1 << j}")
    return "(" + " + ".join(terms) + ")"


def srp_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    n_bits: int | None = None,
    bands: int = 4,
    dims: int = 64,
    method: str = "blas",
    n_rows: int | None = None,
) -> DataFrame:
    """Signed-random-projection (hyperplane) LSH near-dup pairs — the
    data-INDEPENDENT bucketed scale path for embedding dedup.

    Charikar SRP: bit j of a vector's signature is the sign of its dot
    product with a fixed ±1 hyperplane; P[bits agree] = 1 − θ/π for
    angle θ. Signatures are banded (``bands`` bands of n_bits/bands
    bits); pairs colliding in ≥1 band are candidates, verified with the
    exact cosine and kept at >= ``threshold``. Output: vec_a, vec_b,
    cos_sim (6 dp) — same schema as ``cosine_dup_pairs``, a subset of
    its rows (recall at cos 0.35 with 4×4-bit bands is ~0.5 by the
    closed form 1−(1−p⁴)⁴, p = 1−θ/π; raise bands for recall, bits per
    band for candidate precision).

    vs ``cosine_dup_pairs_blocked`` (centroid buckets): SRP needs no
    stats of the corpus — no centroid pass, no assignment join — so a
    signature is a pure per-row expression. That makes it the variant
    that drops into a STREAMING ingest (sign bits computed per
    micro-batch row with zero state) and lets signatures be precomputed
    once and stored as a 64-bit column beside the corpus. Candidates
    meet only inside (band, bucket) partitions; shuffle carries ids +
    4 small ints, never vectors; verification re-reads vectors only for
    candidate ids. Banded first-match emission (the join requires every
    earlier band to differ) keeps each pair single-sourced with no
    dedup shuffle — same trick as ``minhash_lsh_pairs``/
    ``simhash_pairs``.

    ``method="blas"`` (default): a single Arrow pipeline — signatures
    computed batch-wise, then ONE hash shuffle on (band, bucket) and an
    ``applyInPandas`` that enumerates same-bucket pairs, applies the
    first-match band mask, and verifies with row-wise dots in the same
    task. BIT-EXACT with the ``"fold"`` expression twin because every
    sum is taken with ``np.cumsum`` (strict left-to-right float64, the
    same order as ``aggregate``'s sequential fold and DuckDB's list
    fold; no pairwise/BLAS re-association anywhere near a rounding
    boundary, so a knife-edge signature bit or cosine can't flip
    between engines). vs the fold/join twin: no interpreted
    higher-order-function folds (the twin spends ~30M lambda
    invocations verifying the sf0.1 candidate set), no double
    evaluation of the signature stage through a self-join, no
    candidate×vector join — the shuffle carries each vector ``bands``
    times (fixed-size replicas), and per-task memory is bounded by the
    largest (band, bucket) group, the usual bucketed-BLAS tradeoff (a
    hot bucket means too few bits per band). ``method="fold"``: pure
    column expressions + streaming candidate join — the
    unbounded-memory-safe twin, kept for parity debugging (plan
    expressions emitted as SQL strings — one parse each — because 16
    fold-dot projections built op-by-op would cost thousands of py4j
    round trips, see simhash_signatures).

    ``n_bits=None`` (default) derives the signature length from the
    corpus: bits per band = max(4, ceil(log2(n / 64))), so the bucket
    count grows WITH the corpus and expected bucket occupancy stays
    ~constant (~64). With fixed bits, occupancy is n/2^bits and the
    candidate set grows as n² — measured as a 45× wall-clock blow-up on
    a 10× corpus before this; adaptive sizing brings the same step to
    ~linear. The SQL oracle replicates the
    same width formula (scalar-subquery nb selecting among unrolled
    banding branches — `plans.oracles._srp_oracle_adaptive`), so the
    hash contract holds at EVERY corpus size, not only at the ≤500-row
    floor where nb = 4. The recall/bits tradeoff is the
    usual banded-LSH one (more bits per band → fewer false candidates,
    lower recall per band — raise ``bands`` to recover recall at scale).
    """
    if n_bits is None:
        import math

        # one planning-stats scalar — skipped entirely when the caller
        # already knows the corpus size (composed pipelines pass n_rows);
        # counted over the compute-valid rows like the SQL twin
        n = valid_embeddings(embeddings).count() if n_rows is None else n_rows
        nb = max(4, math.ceil(math.log2(max(n, 1) / 64)) if n > 64 else 4)
        n_bits = nb * bands
    nb_per_band = n_bits // bands
    assert nb_per_band * bands == n_bits, "bands must divide n_bits"
    signs = _srp_signs(n_bits, dims)

    if method == "blas":
        import numpy as np
        import pandas as pd

        H = np.array(signs, dtype=np.float64)  # (n_bits, dims)
        ef = _as_float(embeddings)
        bucket_cols = ", ".join(f"bucket{b} int" for b in range(bands))
        sig_schema = f"vec_id long, v array<float>, {bucket_cols}"

        def sig_batches(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
                # (rows × n_bits × dims) elementwise product, summed
                # LEFT-TO-RIGHT via cumsum → identical to the fold
                prod = M[:, None, :] * H[None, :, :]
                dots = np.round(np.cumsum(prod, axis=2)[:, :, -1], 6)
                bits_m = dots >= 0  # -0.0 >= 0 is True, as in SQL
                out = {"vec_id": pdf["vec_id"], "v": pdf["v"]}
                for b in range(bands):
                    val = np.zeros(len(pdf), dtype="int32")
                    for j in range(nb_per_band):
                        val += bits_m[:, b * nb_per_band + j].astype("int32") << j
                    out[f"bucket{b}"] = val
                yield pd.DataFrame(out)

        sig = ef.mapInPandas(sig_batches, sig_schema)
        band_structs = ", ".join(
            f"struct({b} AS band, bucket{b} AS bucket)" for b in range(bands)
        )
        banded = sig.selectExpr(
            "vec_id",
            "v",
            *[f"bucket{b}" for b in range(bands)],
            f"explode(array({band_structs})) AS bb",
        ).selectExpr(
            "vec_id",
            "v",
            *[f"bucket{b}" for b in range(bands)],
            "bb.band AS band",
            "bb.bucket AS bucket",
        )

        def pair_verify(key, pdf):
            band = key[0]
            empty = pd.DataFrame({"vec_a": [], "vec_b": [], "cos_sim": []})
            m = len(pdf)
            if m < 2:
                return empty
            pdf = pdf.sort_values("vec_id")
            ids = pdf["vec_id"].to_numpy()
            ai, bi = np.triu_indices(m, k=1)  # ids sorted → vec_a < vec_b
            # first-match emission: candidate counted in THIS band only
            # if every earlier band's buckets differ
            ok = np.ones(len(ai), dtype=bool)
            for k in range(band):
                bk = pdf[f"bucket{k}"].to_numpy()
                ok &= bk[ai] != bk[bi]
            ai, bi = ai[ok], bi[ok]
            if not len(ai):
                return empty
            M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            A, B = M[ai], M[bi]
            dot = np.cumsum(A * B, axis=1)[:, -1]
            na = np.sqrt(np.cumsum(A * A, axis=1)[:, -1])
            nb = np.sqrt(np.cumsum(B * B, axis=1)[:, -1])
            cos = np.round(dot / (na * nb), 6)
            keep = cos >= threshold
            return pd.DataFrame(
                {"vec_a": ids[ai[keep]], "vec_b": ids[bi[keep]], "cos_sim": cos[keep]}
            )

        return banded.groupBy("band", "bucket").applyInPandas(
            pair_verify, "vec_a long, vec_b long, cos_sim double"
        )

    e = _as_double(embeddings)
    proj_exprs = []
    for j in range(n_bits):
        arr = ", ".join(f"{s:.1f}D" for s in signs[j])
        proj_exprs.append(
            f"round(aggregate(zip_with(v, array({arr}), (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x), 6) >= 0 AS bit{j}"
        )
    bits = e.selectExpr("vec_id", *proj_exprs)
    bucket_exprs = [
        " + ".join(f"cast(bit{b * nb_per_band + j} as int) * {1 << j}" for j in range(nb_per_band))
        + f" AS bucket{b}"
        for b in range(bands)
    ]
    sig = bits.selectExpr("vec_id", *bucket_exprs)
    band_structs = ", ".join(f"struct({b} AS band, bucket{b} AS bucket)" for b in range(bands))
    banded = sig.selectExpr(
        "vec_id",
        *[f"bucket{b}" for b in range(bands)],
        f"explode(array({band_structs})) AS bb",
    ).selectExpr(
        "vec_id", *[f"bucket{b}" for b in range(bands)], "bb.band AS band", "bb.bucket AS bucket"
    )
    a, b = banded.alias("a"), banded.alias("b")
    first_match = " AND ".join(
        f"(a.band <= {k} OR a.bucket{k} != b.bucket{k})" for k in range(bands - 1)
    )
    cand = a.join(
        b,
        F.expr(
            f"a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id AND {first_match}"
        ),
    ).selectExpr("a.vec_id AS vec_a", "b.vec_id AS vec_b")

    ev = _with_norm(embeddings)
    ea = ev.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    eb = ev.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                V.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def project_embeddings(
    embeddings: DataFrame, out_dims: int = 16, dims: int = 64
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress ``dims``-dim
    embeddings to ``out_dims`` components with the SAME deterministic
    md5-derived Rademacher hyperplane family ``srp_dup_pairs`` banks on
    (``_srp_signs``) — component j is ``round(dot(v, h_j) / sqrt(out_dims),
    6)``, i.e. the SRP bit j is exactly ``sign(p_j)``.  Pairwise distances
    are preserved to within ~1/sqrt(out_dims) (JL lemma), which is what a
    100 TB similarity pipeline stores and shuffles: 16 doubles instead of
    64 floats per vector for candidate generation, with exact re-ranking
    against the full vectors only for the survivors.

    Pure column expressions (zip_with + sequential aggregate fold, the
    oracle-stable order), zero shuffle, single scan, no UDF — the plan is
    one Project over the parquet scan, so it scales with the scan.  The
    hyperplanes are literals baked into the plan (out_dims x dims signs),
    not a fitted artifact: no driver state, no broadcast, reproducible in
    any engine.  Output: vec_id, p00..p{out_dims-1} (doubles, 6 dp).

    The reference has no vector ops; this extends its surface per
    BASELINE.json (dim-reduction leg of the similarity-search story).
    """
    import math

    signs = _srp_signs(out_dims, dims)
    inv = 1.0 / math.sqrt(out_dims)
    e = _as_double(embeddings)
    cols = [
        F.round(
            V.dot(F.col("v"), F.array(*[F.lit(s) for s in signs[j]])) * F.lit(inv),
            6,
        ).alias(f"p{j:02d}")
        for j in range(out_dims)
    ]
    return e.select("vec_id", *cols)


def pq_codes(
    embeddings: DataFrame,
    m: int = 4,
    ks: int = 16,
    dims: int = 64,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization codes: split each vector into ``m`` contiguous
    subspaces of ``dims // m`` components and snap every sub-vector to its
    nearest sub-centroid (cosine, tie-break lowest centroid id, 6-dp
    rounding — the repo-wide oracle contract).  Sub-centroids are the
    matching slices of the vectors with ``vec_id < ks`` — the same
    deterministic data-derived scheme every centroid op here uses, so the
    codebook needs no training artifact and the DuckDB oracle can rebuild
    it in pure SQL.

    Storage story at 100 TB: m codes of ceil(log2 ks) bits replace the
    full vector (4 bytes/vector at m=4, ks=16 vs 256 for float32x64 — a
    64x compression), and asymmetric-distance kNN scans codes instead of
    vectors.  Plan shape: the codebook frame is m*ks rows -> broadcast
    hash join against the posexploded sub-vectors (m narrow rows per
    input row, no shuffle to produce), then ONE map-side-combined hash
    aggregation re-assembles the m codes per vec_id — min over a
    (-cos, cid) struct is partially aggregable, so the only exchange
    carries one narrow row per vector.  Zero-norm sub-vectors yield NULL
    cosine and fall out of min(); synthetic corpora don't produce them
    (documented, matching cosine_dup_pairs' contract).

    Output: vec_id, code_0..code_{m-1} (long).
    """
    assert dims % m == 0, "m must divide dims"
    sub_len = dims // m
    e = _as_double(embeddings)
    slices = F.array(*[F.slice("v", g * sub_len + 1, sub_len) for g in range(m)])
    parts = e.select("vec_id", F.posexplode(slices).alias("g", "sv"))
    # sub-centroids come from `codebook` when given (callers coding a
    # SUBSET — e.g. ivfpq_knn's probed buckets — must still quantize
    # against the full-corpus codebook or codes change meaning)
    cb = _as_double(codebook) if codebook is not None else e
    cparts = (
        cb.filter(F.col("vec_id") < ks)
        .select(F.col("vec_id").alias("cid"), "v")
        .select(
            "cid",
            F.posexplode(
                F.array(*[F.slice("v", g * sub_len + 1, sub_len) for g in range(m)])
            ).alias("g", "cv"),
        )
    )
    scored = parts.join(F.broadcast(cparts), "g").select(
        "vec_id",
        "g",
        "cid",
        F.round(V.cosine(F.col("sv"), F.col("cv")), 6).alias("cos"),
    )
    # min over (-cos, cid): highest cosine wins, ties to the lowest
    # centroid id — lexicographic struct ordering IS the tie-break
    codes = [
        F.min(
            F.when(
                F.col("g") == g,
                F.struct((-F.col("cos")).alias("nc"), F.col("cid").alias("cid")),
            )
        )
        .getField("cid")
        .alias(f"code_{g}")
        for g in range(m)
    ]
    return scored.groupBy("vec_id").agg(*codes)


def ivfpq_knn(
    embeddings: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ks: int = 16,
    dims: int = 64,
    rerank: int = 64,
) -> DataFrame:
    """IVF-PQ approximate top-k — the full billion-scale ANN shape on
    DataFrames: an IVF coarse quantizer prunes the corpus to ``n_probe``
    buckets, PQ codes stand in for vectors during candidate scoring
    (asymmetric distance: per-subspace query-vs-codebook cosine lookup
    tables, summed over the m codes), and only the top ``rerank``
    candidates are re-scored against their REAL vectors for the final
    top-k.  Completes the suite knn (exact brute) -> ivf_knn (pruned
    exact) -> ivfpq_knn (pruned + compressed scoring).

    100 TB shape: the corpus-sized inputs are the IVF assignment and the
    code table — both written once, partitioned by centroid_id; a query
    touches n_probe partitions of 4-byte codes, never the vectors, until
    the ``rerank``-row shortlist.  Everything query-sized here is
    broadcast (query vector, probed bucket list, m*ks-row LUT,
    shortlist); the only corpus-wide work is one broadcast-join over the
    probed codes and a partially-aggregated sum of m lookups per
    candidate.  Rounding contract: LUT entries and all emitted
    similarities round to 6 dp; approx_sim is a sum of m 6-dp values
    (re-rounded), so cross-engine accumulation order cannot flip it.
    Ties break on vec_id everywhere.  The query vector itself ranks
    first (cos 1.0) by construction, matching knn/ivf_knn.

    Output: vec_id, approx_sim, cos_sim — top-k by exact cosine over the
    PQ shortlist.

    r15 plan shape — ONE corpus scan, zero corpus-sized exchanges: the
    coarse assignment and the m PQ codes are scan-local argmin
    expressions over literal centroid/codebook matrices (the
    :func:`ivf_knn` inline-assignment discipline extended to PQ), the
    probe filter and the ADC lookup-table sum are per-row expressions,
    and the rerank shortlist rides a TakeOrdered-style local-sort+limit
    (only per-partition top-``rerank`` rows, WITH their vectors, reach
    the single merge partition — rerank × tasks rows, corpus-
    independent). The r14 form paid two corpus-wide SortAggregate
    exchanges (assignment + codes), a corpus-sized SortMergeJoin to
    re-join them, a corpus-sized ADC groupBy exchange, and a third
    corpus scan for the rerank join. Construct runs two bounded driver
    jobs: the max(n_centroids, ks)-row head fetch and an
    (n_centroids + m·ks)-row LOCAL frame computing probe ranking + LUT
    with engine-exact round/cosine semantics (the ivf_knn probe
    precedent). All arithmetic is expression-identical to the r14 form
    (same cosine fold, same 6-dp rounds, same (-cos, cid) tie-breaks,
    same l_0+..+l_{m-1} ADC order), so results are row-identical —
    pinned by the ivfpq equivalence tests and the oracle.
    """
    assert dims % m == 0, "m must divide dims"
    sub_len = dims // m
    e = _as_double(embeddings)
    empty = e.select(
        "vec_id",
        F.lit(0.0).alias("approx_sim"),
        F.lit(0.0).alias("cos_sim"),
    ).limit(0)
    need = max(int(n_centroids), int(ks))
    # head rows + probe ranking + ADC lookup table in ONE bounded job
    # (r16; was a head collect followed by a LocalRelation job) —
    # round/cosine computed by the engine itself (exact oracle parity;
    # the ivf_knn probe-collect precedent). kind 0 rows: full centroid
    # vs query (probe scores); kind 1 rows: codebook sub-vector vs the
    # query's matching slice (LUT entries); kind 2: raw head vectors.
    fetch = _head_scored_fetch(
        e,
        (F.col("vec_id") < need) | (F.col("vec_id") == query_id),
        F.col("vec_id") == query_id,
        n_centroids,
        ks=ks,
        m=m,
        sub_len=sub_len,
        head_max=need,
    )
    by_id = fetch["by_id"]
    if query_id not in by_id:
        return empty
    qv = by_id[query_id]
    qlit = F.array(*[F.lit(x) for x in qv])
    cent_rows = [
        (cid, by_id[cid]) for cid in sorted(by_id) if cid < n_centroids
    ]
    cb_rows = [(cid, by_id[cid]) for cid in sorted(by_id) if cid < ks]
    if not cent_rows or not cb_rows:
        return empty
    scored_local = fetch["rows"]
    probe_scores = _probe_sorted(scored_local)
    probed = [cid for _, cid in probe_scores[: int(n_probe)]]
    lut = {(r["g"], r["cid"]): r["c"] for r in scored_local if r["kind"] == 1}
    # the LUT sum must skip NULL entries exactly like the r14 SUM()
    # aggregate did; engine-valid embeddings can still have a zero
    # SUB-slice, whose cosine is NULL (documented: synthetic corpora
    # don't produce them — the guard keeps the contract anyway; a
    # ValueError, not an assert, so it survives -O). Corpus ROWS with a
    # zero-norm sub-slice remain a documented-unsupported input class:
    # the scan-side argmin folds their NULL sub-scores NULL-first and
    # picks codebook position 0 (adding a real LUT term) where the r14
    # SUM-over-joined-codes skipped the term — divergence documented,
    # inputs never produced by the engine's embedding writers.
    if not all(v is not None and v == v for v in lut.values()):
        raise ValueError(
            "NULL/NaN ADC lookup entry (zero-norm codebook/query "
            "sub-vector) — unsupported by the inline-LUT serving path"
        )
    cnorm = {r["cid"]: r["na"] for r in scored_local if r["kind"] == 0}
    subnorm = {
        (r["g"], r["cid"]): r["na"] for r in scored_local if r["kind"] == 1
    }
    cent_norms = [cnorm[cid] for cid, _ in cent_rows]
    # per-group code POSITION (argmin over the cid-ascending codebook —
    # position order == cid order, so min over (-cos, pos) selects the
    # identical entry as pq_codes' min over (-cos, cid)). Row norm and
    # per-group slice/slice-norm are let-bound (once per row, not once
    # per codebook entry — see _let); codebook norms ride as engine-
    # computed literals, so dot/(nsl·ncb) is value-identical to the
    # cosine() form.
    cb_ids = [cid for cid, _ in cb_rows]
    pos_lit = F.expr(
        "array(" + ",".join(str(p) for p in range(len(cb_rows))) + ")"
    )
    cidx = F.sequence(F.lit(0), F.lit(len(cb_rows) - 1))

    def adc_expr(s2):
        def code_pos_for(g):
            cbmat = _dmat_sql(
                [cv[g * sub_len : (g + 1) * sub_len] for _, cv in cb_rows]
            )
            cbn = _norms_sql([subnorm[(g, cid)] for cid in cb_ids])
            return F.array_min(
                F.transform(
                    cidx,
                    lambda i: F.struct(
                        (
                            -F.round(
                                V.dot(s2[f"sl_{g}"], F.element_at(cbmat, i + 1))
                                / (s2[f"nsl_{g}"] * F.element_at(cbn, i + 1)),
                                6,
                            )
                        ).alias("nc"),
                        F.element_at(pos_lit, i + 1).alias("p"),
                    ),
                )
            ).getField("p")

        terms = []
        for g in range(m):
            code_pos = code_pos_for(g)
            lut_g = F.expr(
                "array("
                + ",".join(
                    f"CAST('{lut[(g, cid)]!r}' AS DOUBLE)" for cid in cb_ids
                )
                + ")"
            )
            terms.append(F.element_at(lut_g, code_pos + 1))
        adc = terms[0]
        for t in terms[1:]:
            adc = adc + t
        return F.round(adc, 6)

    approx_col = _let(
        {
            f"sl_{g}": F.slice(F.col("v"), g * sub_len + 1, sub_len)
            for g in range(m)
        },
        lambda s1: _let(
            {f"nsl_{g}": V.norm(s1[f"sl_{g}"]) for g in range(m)}
            | {f"sl_{g}": s1[f"sl_{g}"] for g in range(m)},
            adc_expr,
        ),
    )
    cid_col = _let(
        {"nv": V.norm(F.col("v"))},
        lambda s: _inline_best(F.col("v"), cent_rows, cent_norms, s["nv"]),
    ).getField("cid")
    shortlist = (
        e.withColumn("cid", cid_col)
        .filter(F.col("cid").isin(probed))
        .select("vec_id", "v", approx_col.alias("approx_sim"))
        .orderBy(F.desc("approx_sim"), F.asc("vec_id"))
        .limit(rerank)
    )
    return (
        shortlist.select(
            "vec_id",
            "approx_sim",
            F.round(V.cosine(F.col("v"), qlit), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def write_ann_index(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 4,
    ks: int = 16,
    dims: int = 64,
) -> None:
    """Materialize the IVF-PQ index the docstrings promise: one pass
    computes the coarse assignment + PQ codes and writes

    * ``{path}/index`` — vec_id, v, code_0..code_{m-1}, PARTITIONED BY
      centroid_id (repartitioned on it first: one file per bucket, not
      one per task x bucket), and
    * ``{path}/centroids`` — the n_centroids (centroid_id, cv) rows +
      the m x ks sub-codebook, tiny.

    After this runs once, every query is `ivfpq_knn_indexed`: read the
    tiny centroids file, pick n_probe buckets, and scan ONLY those
    partitions of the index (partition pruning — asserted by test).
    At 100 TB this is the difference between an ANN query costing a
    corpus scan and costing n_probe/n_centroids of one.

    r15 build shape — ONE corpus scan + ONE exchange (the centroid_id
    repartition feeding the partitioned write): assignment and the m
    PQ codes are scan-local argmin expressions over literal centroid/
    codebook matrices (the ivfpq_knn inline rewrite; norms let-bound
    per row, centroid/codebook norms driver-computed via the
    bit-exact _pynorm). The r14 build paid three corpus scans, two
    corpus-wide SortAggregate exchanges and two corpus-sized
    SortMergeJoins to re-join assignment and codes on vec_id. Values
    are expression-identical (same folds, rounds, (-cos, cid)
    tie-breaks), so the written layout is row-identical — pinned by
    the index-vs-ivfpq_knn equivalence tests.
    """
    assert dims % m == 0, "m must divide dims"
    sub_len = dims // m
    e = _as_double(embeddings)
    need = max(int(n_centroids), int(ks))
    head = e.filter(F.col("vec_id") < need).collect()
    by_id = {int(r["vec_id"]): [float(x) for x in r["v"]] for r in head}
    cent_rows = [
        (cid, by_id[cid]) for cid in sorted(by_id) if cid < n_centroids
    ]
    cb_rows = [(cid, by_id[cid]) for cid in sorted(by_id) if cid < ks]
    code_names = [f"code_{g}" for g in range(m)]
    if cent_rows and cb_rows:
        cent_norms = [_pynorm(cv) for _, cv in cent_rows]
        cb_lits = _ids_sql([cid for cid, _ in cb_rows])
        cidx = F.sequence(F.lit(0), F.lit(len(cb_rows) - 1))

        def pq_struct(s2):
            fields = [
                _inline_best(s2["v"], cent_rows, cent_norms, s2["nv"])
                .getField("cid")
                .alias("centroid_id")
            ]

            def code_for(g):
                cbmat = _dmat_sql(
                    [cv[g * sub_len : (g + 1) * sub_len] for _, cv in cb_rows]
                )
                cbn = _norms_sql(
                    [_pynorm(cv[g * sub_len : (g + 1) * sub_len]) for _, cv in cb_rows]
                )
                return (
                    F.array_min(
                        F.transform(
                            cidx,
                            lambda i: F.struct(
                                (
                                    -F.round(
                                        V.dot(
                                            s2[f"sl_{g}"],
                                            F.element_at(cbmat, i + 1),
                                        )
                                        / (
                                            s2[f"nsl_{g}"]
                                            * F.element_at(cbn, i + 1)
                                        ),
                                        6,
                                    )
                                ).alias("nc"),
                                F.element_at(cb_lits, i + 1).alias("cid"),
                            ),
                        )
                    )
                    .getField("cid")
                    .alias(f"code_{g}")
                )

            for g in range(m):
                fields.append(code_for(g))
            return F.struct(*fields)

        pq_col = _let(
            {
                "v": F.col("v"),
                "nv": V.norm(F.col("v")),
            }
            | {
                f"sl_{g}": F.slice(F.col("v"), g * sub_len + 1, sub_len)
                for g in range(m)
            },
            lambda s1: _let(
                {
                    "v": s1["v"],
                    "nv": s1["nv"],
                }
                | {f"sl_{g}": s1[f"sl_{g}"] for g in range(m)}
                | {f"nsl_{g}": V.norm(s1[f"sl_{g}"]) for g in range(m)},
                pq_struct,
            ),
        )
        indexed = e.withColumn("_pq", pq_col).select(
            "vec_id",
            "v",
            F.col("_pq").getField("centroid_id").alias("centroid_id"),
            *[
                F.col("_pq").getField(name).alias(name)
                for name in code_names
            ],
        )
    else:
        # no head rows below max(n_centroids, ks): nothing can be
        # assigned or coded — the r14 inner joins produced an EMPTY
        # index with the same schema
        indexed = e.select(
            "vec_id",
            "v",
            F.lit(None).cast("long").alias("centroid_id"),
            *[F.lit(None).cast("long").alias(name) for name in code_names],
        ).limit(0)
    (
        indexed.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/index")
    )
    e.filter(F.col("vec_id") < max(n_centroids, ks)).select(
        "vec_id", F.col("v").alias("cv")
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivfpq_knn_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ks: int = 16,
    dims: int = 64,
    rerank: int = 64,
) -> DataFrame:
    """Serve an ANN query from a materialized `write_ann_index` layout.

    The centroid file is planning-sized: probing collects the n_probe
    winning centroid ids (a bounded, documented collect — the literal
    values are what MAKES the index read partition-prunable; the same
    pattern every ANN serving layer uses) and the m x ks LUT is built
    from the codebook rows against Python-side query slices. The
    corpus-sized read then carries an explicit ``centroid_id IN (...)``
    filter on the PARTITION column — only the probed directories are
    listed or scanned (asserted by test). Scoring matches `ivfpq_knn`:
    summed per-subspace LUT cosines over the stored codes, exact
    re-rank of the ``rerank`` shortlist against the stored vectors.

    Output: vec_id, approx_sim, cos_sim (same contract as ivfpq_knn,
    and bit-identical to it for the same corpus/query — the equivalence
    the test pins).
    """
    from functools import reduce

    assert dims % m == 0
    sub_len = dims // m
    cents = spark.read.parquet(f"{path}/centroids")
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    probed_rows = (
        cents.filter(F.col("vec_id") < n_centroids)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.round(V.cosine(F.col("cv"), qcol), 6).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), F.asc("centroid_id"))
        .limit(n_probe)
        .collect()
    )
    probed_ids = [r["centroid_id"] for r in probed_rows]

    luts = []
    for g in range(m):
        qsub = F.array(
            *[F.lit(float(x)) for x in query_vec[g * sub_len : (g + 1) * sub_len]]
        )
        luts.append(
            cents.filter(F.col("vec_id") < ks).select(
                F.lit(g).alias("g"),
                F.col("vec_id").alias("cid"),
                F.round(
                    V.cosine(F.slice("cv", g * sub_len + 1, sub_len), qsub), 6
                ).alias("l"),
            )
        )
    lut = reduce(DataFrame.union, luts)

    idx = spark.read.parquet(f"{path}/index").filter(
        F.col("centroid_id").isin(probed_ids)
    )
    melted = idx.select(
        "vec_id",
        F.posexplode(F.array(*[f"code_{g}" for g in range(m)])).alias("g", "cid"),
    )
    approx = (
        melted.join(F.broadcast(lut), ["g", "cid"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("l"), 6).alias("approx_sim"))
    )
    shortlist = approx.orderBy(F.desc("approx_sim"), F.asc("vec_id")).limit(rerank)
    return (
        idx.select("vec_id", "v")
        .join(F.broadcast(shortlist), "vec_id")
        .select(
            "vec_id",
            "approx_sim",
            F.round(V.cosine(F.col("v"), qcol), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivfpq_recall(
    embeddings: DataFrame, query_id: int = 0, k: int = 10, **ivfpq_kwargs
) -> DataFrame:
    """Recall audit for the compressed ANN path: |ivfpq top-k ∩ exact
    top-k| / k — the similarity-search counterpart of
    ``dedup.lsh_recall_summary``, composing two certified operators so
    the metric's ground truth is definitionally the oracle-checked
    queries. Both sides are k-row frames; the intersection is a
    broadcast semi-join, the counts one crossJoin of two 1-row
    aggregates — no collect. Output (one row): k, n_hits, recall (4 dp).
    """
    exact = knn(embeddings, query_id=query_id, k=k).select("vec_id")
    approx = ivfpq_knn(embeddings, query_id=query_id, k=k, **ivfpq_kwargs).select(
        "vec_id"
    )
    hits = approx.join(F.broadcast(exact), "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    total = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    return hits.crossJoin(total).select(
        F.lit(k).cast("int").alias("k"),
        F.col("n_hits"),
        F.round(F.col("n_hits") / F.col("n_exact"), 4).alias("recall"),
    )


def srp_recall_summary(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Self-measured SRP-LSH quality: recall of ``srp_dup_pairs``
    against the exact ``cosine_dup_pairs`` ground truth at the same
    threshold — completing the audit family (`dedup.lsh_recall_summary`
    for text MinHash, `ivfpq_recall` for compressed kNN, this for the
    embedding near-dup path). Precision is 1.0 by construction
    (candidates are exact-cosine verified before emission), so the
    metric reduces to two 1-row counts; the truth side is the
    documented O(n²) exact baseline — a validation query, not a
    hot-path one. Output: n_true, n_lsh, recall (4 dp).
    """
    n_true = cosine_dup_pairs(embeddings, threshold=threshold).agg(
        F.count(F.lit(1)).alias("n_true")
    )
    n_lsh = srp_dup_pairs(embeddings, threshold=threshold).agg(
        F.count(F.lit(1)).alias("n_lsh")
    )
    return n_true.crossJoin(F.broadcast(n_lsh)).select(
        "n_true",
        "n_lsh",
        F.when(
            F.col("n_true") > 0, F.round(F.col("n_lsh") / F.col("n_true"), 4)
        ).alias("recall"),
    )


def pq_distortion(
    embeddings: DataFrame, m: int = 4, ks: int = 16, dims: int = 64
) -> DataFrame:
    """Quantization-quality audit for the PQ codebook — the third leg
    of the audit family (recall audits measure search quality; this
    measures REPRESENTATION quality): per subspace, the mean cosine
    between each sub-vector and its chosen sub-centroid, and how many
    sub-vectors land below 0.8 (poorly covered by the codebook — the
    signal to raise ks or retrain). Same broadcast-codebook scoring
    shape as `pq_codes`, one map-side-combined aggregation.

    Output: g, n_vecs, mean_best_cos (4 dp), n_low.
    """
    assert dims % m == 0
    sub_len = dims // m
    e = _as_double(embeddings)
    slices = F.array(*[F.slice("v", g * sub_len + 1, sub_len) for g in range(m)])
    parts = e.select("vec_id", F.posexplode(slices).alias("g", "sv"))
    cparts = (
        e.filter(F.col("vec_id") < ks)
        .select(F.col("vec_id").alias("cid"), "v")
        .select(
            "cid",
            F.posexplode(
                F.array(*[F.slice("v", g * sub_len + 1, sub_len) for g in range(m)])
            ).alias("g", "cv"),
        )
    )
    scored = parts.join(F.broadcast(cparts), "g").select(
        "vec_id", "g", F.round(V.cosine(F.col("sv"), F.col("cv")), 6).alias("cos")
    )
    best = scored.groupBy("vec_id", "g").agg(F.max("cos").alias("best"))
    return (
        best.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("best"), 4).alias("mean_best_cos"),
            F.sum(F.when(F.col("best") < 0.8, 1).otherwise(0)).alias("n_low"),
        )
        .orderBy("g")
    )


def cluster_balance_audit(embeddings: DataFrame, n_centroids: int = 16) -> DataFrame:
    """IVF bucket-health audit: the size distribution of
    ``assign_centroids`` buckets — the number an ANN deployment tunes
    ``n_centroids``/``n_probe`` by. A balance factor near 1 means probes
    cost what the math says; a hot bucket means probe latency is
    whatever that bucket costs (the embedding-space analogue of
    ``users.skew_report``).

    One assignment pass (broadcast centroids, narrow-row exchange),
    one map-side-combined count per bucket, constant-size output:
    n_buckets, n_vecs, min_bucket, max_bucket, avg_bucket (4 dp),
    balance_factor (max/avg, 4 dp).
    """
    counts = assign_centroids(embeddings, n_centroids).groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n").alias("n_vecs"),
        F.min("n").alias("min_bucket"),
        F.max("n").alias("max_bucket"),
        F.round(F.avg("n"), 4).alias("avg_bucket"),
        F.round(F.max("n") / F.avg("n"), 4).alias("balance_factor"),
    )


def knn_batch(embeddings: DataFrame, n_queries: int = 4, k: int = 5) -> DataFrame:
    """Batched exact top-k — the serving shape for scoring MANY queries
    against the corpus in ONE scan (``knn``/``ivf_knn`` are
    one-query-per-scan; a recommendation or retrieval batch is not).
    The ``n_queries`` lowest vec_ids play the query batch: the query
    matrix broadcasts, every corpus vector scores against all queries
    in a single pass, and the per-query ``rank ≤ k`` window compiles to
    WindowGroupLimit — map tasks pre-trim to k rows per query BEFORE
    the exchange, so the shuffle carries O(k × queries × tasks) rows
    regardless of corpus size. Self included at rank 1 (cos 1.0), the
    ``knn`` contract. Output: query_id, vec_id, cos_sim (6 dp), rank.
    """
    e = _as_double(embeddings)
    # norms factored out of the per-(row, query) cosine (r15): the row
    # norm is computed once per ROW below the join (not once per
    # query) and each query norm once at broadcast build (not once per
    # joined row) — dot/(nv·nq) is value-identical to cosine() and cuts
    # the scored expression from 192 to 64 mult-adds per pair
    qs = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        V.norm(F.col("v")).alias("nq"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        e.select("vec_id", "v", V.norm(F.col("v")).alias("nv"))
        .crossJoin(F.broadcast(qs))
        .select(
            "query_id",
            "vec_id",
            F.round(
                V.dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")),
                6,
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )

def ivf_knn_batch(
    embeddings: DataFrame,
    n_queries: int = 4,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    head_fetch: dict | None = None,
) -> DataFrame:
    """Batched IVF serving WITHOUT a materialized index — ``ivf_knn``
    for a query batch in ONE corpus scan (``knn_batch``'s serving
    shape applied to the probe-pruned path): the ``n_queries`` lowest
    vec_ids play the query batch, per-query probe sets are selected on
    a local (n_centroids × n_queries)-row frame with engine-exact
    rounding, and the corpus scan assigns each vector inline (the
    ``ivf_knn`` min(struct) argmin over ONE parsed centroid-matrix SQL
    literal), fans out only to the queries whose probe set contains
    its bucket, and pre-trims to k rows per query per task via the
    rank window's WindowGroupLimit before the single tiny exchange.

    Row-for-row identical to per-query ``ivf_knn`` calls (pinned by
    test) at 1/n_queries of the scans. Bounded driver work: the
    (max(n_centroids, n_queries))-row head fetch + the probe ranking.
    Output: query_id, vec_id, cos_sim (6 dp), rank (≤ k per query).
    """
    e = _as_double(embeddings)
    spark = embeddings.sparkSession
    out_schema = "query_id long, vec_id long, cos_sim double, rank int"
    # head_fetch: a caller that already ran the fused head fetch
    # (retrieval_quality shares ONE _head_scored_fetch across the ivf
    # and ivfpq batch legs — the per_doc_df/shingle_df pass-through
    # pattern) supplies the bundle; the build bound is VALIDATED (not
    # trusted) so a parameter drift raises instead of silently
    # shrinking the centroid/query rows (r15 ADVICE). None keeps the
    # self-contained fetch. Only the raw head rows are consumed here —
    # this op's probe ranking stays a lazy in-plan subtree (r15).
    need = max(n_centroids, n_queries)
    if head_fetch is None:
        head = e.filter(F.col("vec_id") < need).collect()
        by_id = {r["vec_id"]: [float(x) for x in r["v"]] for r in head}
    else:
        if head_fetch["head_max"] < need:
            raise ValueError(
                f"shared head fetch covers vec_id < {head_fetch['head_max']}"
                f" but ivf_knn_batch needs vec_id < {need}"
            )
        by_id = {
            cid: v for cid, v in head_fetch["by_id"].items() if cid < need
        }
    cent_rows = [(int(i), by_id[i]) for i in sorted(by_id) if i < n_centroids]
    query_rows = [(int(i), by_id[i]) for i in sorted(by_id) if i < n_queries]
    if not cent_rows or not query_rows:
        return spark.createDataFrame([], out_schema)
    cents_local = spark.createDataFrame(
        cent_rows, "centroid_id long, cv array<double>"
    )
    qs_local = spark.createDataFrame(
        query_rows, "query_id long, qv array<double>"
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("centroid_id")
    )
    # broadcast per the repo-wide crossJoin rule — without the hint the
    # two local relations plan a 32×32-task CartesianProduct that costs
    # ~14 s of pure scheduling for 64 rows (measured, r13). The probe
    # ranking stays LAZY (r15): it used to be collected at construct
    # and re-created as a local relation, costing a driver-blocking
    # job per call; as a (n_queries·n_probe)-row subtree of the
    # broadcast build it computes inside the query's own action with
    # identical rows (same expressions, same window, same tie-break).
    probe_frame = (
        cents_local.crossJoin(F.broadcast(qs_local))
        .select(
            "query_id",
            "centroid_id",
            "qv",
            F.round(V.cosine(F.col("cv"), F.col("qv")), 6).alias("c_sim"),
        )
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= n_probe)
        .select(
            "query_id",
            F.col("centroid_id").alias("cid"),
            "qv",
            V.norm(F.col("qv")).alias("nq"),
        )
    )
    # inline assignment over the literal centroid matrix, norms
    # factored (r15): the row norm is a projection column (computed
    # once per row, reused by the scored cosine) and centroid norms
    # are driver-computed literals (_pynorm — bit-identical to
    # V.norm, no rounding involved), so the argmin does one dot per
    # centroid instead of dot + two norms
    cent_norms = [_pynorm(cv) for _, cv in cent_rows]
    best = _inline_best(F.col("v"), cent_rows, cent_norms, F.col("nv"))
    # fan out each row ONLY to the queries whose probe set contains its
    # bucket, via a broadcast hash join on the bucket id: the tiny
    # (Σ|probe sets|)-row frame carries (query_id, cid, qv), so the
    # query vector arrives as a COLUMN and the per-row expression stays
    # the same argmin the solo path compiles. (Two rejected shapes from
    # the first r13 decade sweep: exploding the full query range
    # inflated every vector-carrying row n_queries× before pruning —
    # 16.4 s at sf1, slower than n_queries solo scans — and indexing
    # per-query literal matrices per row pushed the generated code past
    # the codegen limits into interpreted fallback, 18 s.)
    probe_sdf = F.broadcast(probe_frame)
    scored = (
        e.select("vec_id", "v", V.norm(F.col("v")).alias("nv"))
        .withColumn("cid", best["cid"])
        .join(probe_sdf, "cid")
        .select(
            "query_id",
            "vec_id",
            F.round(
                V.dot(F.col("v"), F.col("qv")) / (F.col("nv") * F.col("nq")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_knn_batch(
    embeddings: DataFrame,
    n_queries: int = 4,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ks: int = 16,
    dims: int = 64,
    rerank: int = 64,
    head_fetch: dict | None = None,
) -> DataFrame:
    """Batched IVF-PQ serving without a materialized index — the
    ``ivfpq_knn`` chain for a query batch with every corpus-sized
    stage computed ONCE: one coarse assignment, one code table, then
    per-query broadcast-sized frames (probe sets, m·ks·n_queries LUT,
    rerank-row shortlists) and WindowGroupLimit-trimmed per-query
    rank windows, exactly the ``ivfpq_knn_index_batch`` serving
    discipline applied in-plan. Row-for-row identical to per-query
    ``ivfpq_knn`` calls (pinned by test). Output: query_id, vec_id,
    approx_sim, cos_sim, rank (≤ k per query, ranked by exact cosine).

    r15 plan shape — ONE corpus scan for the whole batch (the
    :func:`ivfpq_knn` inline rewrite, vectorized over queries):
    assignment + per-group code positions are scan-local argmin
    expressions over literal matrices; each row explodes only the
    (≤ n_queries) queries that probed its bucket; per-(query, row) ADC
    is a literal-LUT lookup sum; the only exchanges left are the two
    WindowGroupLimit-trimmed per-query windows (shortlist + final
    rank), which carry O(rerank × queries × tasks) rows regardless of
    corpus size. The r14 form paid two corpus-wide SortAggregate
    exchanges, a corpus-sized SortMergeJoin, a corpus-sized ADC
    groupBy exchange, and a third corpus scan for the rerank join.
    Construct runs two bounded driver jobs (head fetch + the
    (n_queries·n_centroids + n_queries·m·ks)-row local probe/LUT
    frame, engine-exact rounding). Arithmetic is expression-identical
    to r14 (same folds, rounds, tie-breaks, ADC order) — pinned by
    the batch-vs-solo equivalence test and the oracle.
    """
    assert dims % m == 0, "m must divide dims"
    sub_len = dims // m
    e = _as_double(embeddings)
    empty = e.select(
        F.col("vec_id").alias("query_id"),
        "vec_id",
        F.lit(0.0).alias("approx_sim"),
        F.lit(0.0).alias("cos_sim"),
        F.lit(1).alias("rank"),
    ).limit(0)
    need = max(int(n_centroids), int(ks), int(n_queries))
    # head_fetch: shared fused-fetch pass-through (retrieval_quality
    # runs ONE _head_scored_fetch for the ivf and ivfpq batch legs);
    # None = self-contained. Either way, head rows + probe rankings +
    # per-query ADC LUTs come from ONE bounded job (r16; was a head
    # collect followed by a LocalRelation job).
    if head_fetch is None:
        head_fetch = _head_scored_fetch(
            e,
            F.col("vec_id") < need,
            F.col("vec_id") < n_queries,
            n_centroids,
            ks=ks,
            m=m,
            sub_len=sub_len,
            q_max=n_queries,
            head_max=need,
        )
    else:
        _check_fetch(
            head_fetch,
            n_centroids=n_centroids,
            ks=ks,
            m=m,
            q_max=n_queries,
            need=need,
        )
    by_id = {
        cid: v for cid, v in head_fetch["by_id"].items() if cid < need
    }
    q_ids = [qid for qid in sorted(by_id) if qid < n_queries]
    cent_rows = [
        (cid, by_id[cid]) for cid in sorted(by_id) if cid < n_centroids
    ]
    cb_rows = [(cid, by_id[cid]) for cid in sorted(by_id) if cid < ks]
    if not q_ids or not cent_rows or not cb_rows:
        return empty
    scored_local = [
        r
        for r in head_fetch["rows"]
        if r["kind"] != 2 and r["qid"] is not None and r["qid"] < n_queries
    ]
    probed_by_q = {}
    for qid in q_ids:
        scores = _probe_sorted(scored_local, qid=qid)
        probed_by_q[qid] = [cid for _, cid in scores[: int(n_probe)]]
    lut = {
        (r["qid"], r["g"], r["cid"]): r["c"]
        for r in scored_local
        if r["kind"] == 1
    }
    if not all(v is not None and v == v for v in lut.values()):
        raise ValueError(
            "NULL/NaN ADC lookup entry (zero-norm codebook/query "
            "sub-vector) — unsupported by the inline-LUT serving path"
        )
    cnorm = {r["cid"]: r["na"] for r in scored_local if r["kind"] == 0}
    subnorm = {
        (r["g"], r["cid"]): r["na"] for r in scored_local if r["kind"] == 1
    }
    cent_norms = [cnorm[cid] for cid, _ in cent_rows]
    cb_ids = [cid for cid, _ in cb_rows]
    pos_lit = F.expr(
        "array(" + ",".join(str(p) for p in range(len(cb_rows))) + ")"
    )
    cidx = F.sequence(F.lit(0), F.lit(len(cb_rows) - 1))

    # assignment + the m code positions in ONE let-bound struct: the
    # row norm, slices and slice norms are computed once per row (not
    # once per centroid/codebook entry — see _let); codebook norms are
    # engine-computed literals, dot/(n·n) value-identical to cosine()
    def pq_struct(s2):
        fields = [
            _inline_best(s2["v"], cent_rows, cent_norms, s2["nv"])
            .getField("cid")
            .alias("cid")
        ]
        def cp_for(g):
            cbmat = _dmat_sql(
                [cv[g * sub_len : (g + 1) * sub_len] for _, cv in cb_rows]
            )
            cbn = _norms_sql([subnorm[(g, cid)] for cid in cb_ids])
            return (
                F.array_min(
                    F.transform(
                        cidx,
                        lambda i: F.struct(
                            (
                                -F.round(
                                    V.dot(
                                        s2[f"sl_{g}"],
                                        F.element_at(cbmat, i + 1),
                                    )
                                    / (
                                        s2[f"nsl_{g}"]
                                        * F.element_at(cbn, i + 1)
                                    ),
                                    6,
                                )
                            ).alias("nc"),
                            F.element_at(pos_lit, i + 1).alias("p"),
                        ),
                    )
                )
                .getField("p")
                .alias(f"cp_{g}")
            )

        for g in range(m):
            fields.append(cp_for(g))
        return F.struct(*fields)

    pq_col = _let(
        {
            "v": F.col("v"),
            "nv": V.norm(F.col("v")),
        }
        | {
            f"sl_{g}": F.slice(F.col("v"), g * sub_len + 1, sub_len)
            for g in range(m)
        },
        lambda s1: _let(
            {
                "v": s1["v"],
                "nv": s1["nv"],
            }
            | {f"sl_{g}": s1[f"sl_{g}"] for g in range(m)}
            | {f"nsl_{g}": V.norm(s1[f"sl_{g}"]) for g in range(m)},
            pq_struct,
        ),
    )
    # which query positions probe this row's bucket (inner-join
    # semantics: rows probed by nobody drop out of the explode)
    probed_lists = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{c}L" for c in probed_by_q[qid]) + ")"
            if probed_by_q[qid]
            else "array(CAST(-1 AS BIGINT))"
            for qid in q_ids
        )
        + ")"
    )
    qid_lit = _ids_sql(q_ids)
    qmat = _dmat_sql([by_id[qid] for qid in q_ids])
    # per-query flattened LUT (g-major, codebook position ascending)
    lut_all = F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                f"CAST('{lut[(qid, g, cid)]!r}' AS DOUBLE)"
                for g in range(m)
                for cid in cb_ids
            )
            + ")"
            for qid in q_ids
        )
        + ")"
    )
    ncb = len(cb_rows)
    qpos_arr = F.filter(
        F.sequence(F.lit(0), F.lit(len(q_ids) - 1)),
        lambda qp: F.array_contains(
            F.element_at(probed_lists, qp + 1), F.col("cid")
        ),
    )
    cand = (
        e.withColumn("_pq", pq_col)
        .select(
            "vec_id",
            "v",
            F.col("_pq").getField("cid").alias("cid"),
            *[
                F.col("_pq").getField(f"cp_{g}").alias(f"cp_{g}")
                for g in range(m)
            ],
        )
        .select(
            "vec_id",
            "v",
            *[f"cp_{g}" for g in range(m)],
            F.explode(qpos_arr).alias("qp"),
        )
    )
    qlut = F.element_at(lut_all, F.col("qp") + 1)
    terms = [
        F.element_at(qlut, F.col(f"cp_{g}") + F.lit(g * ncb + 1))
        for g in range(m)
    ]
    adc = terms[0]
    for t in terms[1:]:
        adc = adc + t
    scored = cand.select(
        F.element_at(qid_lit, F.col("qp") + 1).alias("query_id"),
        "vec_id",
        "v",
        "qp",
        F.round(adc, 6).alias("approx_sim"),
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.asc("vec_id")
    )
    shortlist = (
        scored.withColumn("rn", F.row_number().over(sw))
        .filter(F.col("rn") <= rerank)
        .select("query_id", "vec_id", "v", "qp", "approx_sim")
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        shortlist.select(
            "query_id",
            "vec_id",
            "approx_sim",
            F.round(
                V.cosine(F.col("v"), F.element_at(qmat, F.col("qp") + 1)), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(rw))
        .filter(F.col("rank") <= k)
    )


def ivfpq_knn_index_batch(
    spark,
    path: str,
    query_vecs: list[tuple[int, list[float]]],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 4,
    ks: int = 16,
    dims: int = 64,
    rerank: int = 64,
) -> DataFrame:
    """Serve a QUERY BATCH from a materialized `write_ann_index` layout
    — the production retrieval shape (`ivfpq_knn_indexed` serves one
    query per pruned read; a retrieval batch would re-pay the index
    open/prune overhead N times). The union of every query's probed
    partitions is read ONCE with an explicit ``centroid_id IN (...)``
    partition filter (pruning asserted by test); a per-query membership
    join against the broadcast (query_id, centroid_id) probe table then
    restricts each query's scoring to exactly the buckets IT probed —
    so each query scores the same candidate set as its solo run.

    Per-query work matches `ivfpq_knn_indexed` expression-for-
    expression (6-dp LUT cosines summed and re-rounded, exact re-rank
    of the rerank-shortlist against stored vectors), so the batch rows
    are bit-identical to per-query serving — pinned by test against
    `ivfpq_knn` itself. The per-query shortlist/top-k caps use
    ``row_number() <= n`` windows that compile to WindowGroupLimit:
    map tasks pre-trim BEFORE the exchange, so the shuffle carries
    O(rerank × queries × tasks) rows regardless of corpus size (the
    `knn_batch` discipline). Bounded documented collects: the
    n_centroids-row probe scoring only.

    Output: query_id, vec_id, approx_sim, cos_sim, rank (≤ k rows per
    query, ranked by exact cosine desc).
    """
    assert dims % m == 0
    sub_len = dims // m
    out_schema = (
        "query_id long, vec_id long, approx_sim double, cos_sim double, "
        "rank int"
    )
    if not query_vecs:
        return spark.createDataFrame([], out_schema)
    qlist = [(int(qid), [float(x) for x in qv]) for qid, qv in query_vecs]
    # the PQ LUT is built from the stored centroids file filtered by
    # vec_id < ks — if the writer stored fewer rows than the CORPUS has
    # low-id vectors, the codebook would silently truncate and
    # approx_sim diverge from the ivfpq_knn twin. A TINY corpus
    # legitimately stores fewer than max(ks, n_centroids) rows (the
    # writer keeps every vec_id < max(ks, n_centroids) that exists, and
    # ivfpq_knn's `vec_id < n` filters degrade the same way), so the
    # guard compares against the index itself instead of asserting a
    # fixed count; an EMPTY index serves an empty result. The centroids
    # file is planning-sized (coalesce(1)): raw rows, per-query probe
    # scores and ADC LUT entries are sibling union legs of ONE job over
    # it (r16; r15 collected the file, then ran a LocalRelation scoring
    # job — two driver jobs where one suffices). Query vectors enter
    # the plan as exact repr-round-trip literals; engine round/cosine
    # semantics unchanged.
    base = spark.read.parquet(f"{path}/centroids").select(
        F.col("vec_id").alias("cid"), F.col("cv")
    )
    qn = len(qlist)
    qmat = _dmat_sql([qv for _, qv in qlist])
    qp_all = F.explode(F.lit(list(range(qn)))).alias("qp")
    _nd = F.lit(None).cast("double")
    _nl = F.lit(None).cast("long")
    _nv = F.lit(None).cast("array<double>")
    qv_col = F.element_at(qmat, F.col("qp") + 1)
    k0 = (
        base.filter(F.col("cid") < n_centroids)
        .select("cid", "cv", qp_all)
        .select(
            F.lit(0).alias("kind"),
            F.col("qp"),
            F.lit(-1).alias("g"),
            F.col("cid"),
            F.round(V.cosine(F.col("cv"), qv_col), 6).alias("c"),
            _nl.alias("vid"),
            _nv.alias("v"),
        )
    )
    gc = F.col("g")

    def _sl(col):
        return F.slice(col, gc * sub_len + 1, F.lit(sub_len))

    k1 = (
        base.filter(F.col("cid") < ks)
        .select("cid", "cv", qp_all)
        .select(
            "cid", "cv", "qp", F.explode(F.lit(list(range(m)))).alias("g")
        )
        .select(
            F.lit(1).alias("kind"),
            F.col("qp"),
            gc,
            F.col("cid"),
            F.round(V.cosine(_sl(F.col("cv")), _sl(qv_col)), 6).alias("c"),
            _nl.alias("vid"),
            _nv.alias("v"),
        )
    )
    k2 = base.select(
        F.lit(2).alias("kind"),
        F.lit(-1).alias("qp"),
        F.lit(-1).alias("g"),
        _nl.alias("cid"),
        _nd.alias("c"),
        F.col("cid").alias("vid"),
        F.col("cv").alias("v"),
    )
    scored_local = k0.unionByName(k1).unionByName(k2).collect()
    raw = [r for r in scored_local if r["kind"] == 2]
    stored = len(raw)
    need = max(ks, n_centroids)
    if stored == 0:
        return spark.createDataFrame([], out_schema)
    if stored < need:
        low = (
            spark.read.parquet(f"{path}/index")
            .filter(F.col("vec_id") < need)
            .count()
        )
        assert low == stored, (
            f"index at {path} stores {stored} centroid rows but its corpus "
            f"has {low} vectors below max(ks, n_centroids)={need} — the "
            "layout was written with smaller parameters; rebuild with "
            "write_ann_index"
        )
    by_id = {int(r["vid"]): [float(x) for x in r["v"]] for r in raw}
    cent_ids = [cid for cid in sorted(by_id) if cid < n_centroids]
    cb_ids = [cid for cid in sorted(by_id) if cid < ks]
    if not cent_ids or not cb_ids:
        return spark.createDataFrame([], out_schema)
    probed_by_qp = {}
    for qp in range(len(qlist)):
        scores = sorted(
            (
                (r["c"], r["cid"])
                for r in scored_local
                if r["kind"] == 0 and r["qp"] == qp
            ),
            key=lambda t: (t[0] is None, -(t[0] or 0.0), t[1]),
        )
        probed_by_qp[qp] = [cid for _, cid in scores[: int(n_probe)]]
    lut = {
        (r["qp"], r["g"], r["cid"]): r["c"]
        for r in scored_local
        if r["kind"] == 1
    }
    if not all(v is not None and v == v for v in lut.values()):
        raise ValueError(
            "NULL/NaN ADC lookup entry (zero-norm codebook/query "
            "sub-vector) — unsupported by the inline-LUT serving path"
        )
    probes_df = F.broadcast(
        spark.createDataFrame(
            [
                (qp, qlist[qp][0], int(cid))
                for qp in range(len(qlist))
                for cid in probed_by_qp[qp]
            ],
            "qp int, query_id long, centroid_id int",
        )
    )
    union_ids = sorted(
        {int(c) for qp in probed_by_qp for c in probed_by_qp[qp]}
    )
    if not union_ids:
        return spark.createDataFrame([], out_schema)
    idx = spark.read.parquet(f"{path}/index").filter(
        F.col("centroid_id").isin(union_ids)
    )
    # per-group, per-query cid→LUT-value literal maps (stored codes ARE
    # codebook vec_ids, so the lookup key is the code column itself)
    terms = []
    for g in range(m):
        maps_g = F.expr(
            "array("
            + ",".join(
                "map("
                + ",".join(
                    f"{cid}L, CAST('{lut[(qp, g, cid)]!r}' AS DOUBLE)"
                    for cid in cb_ids
                )
                + ")"
                for qp in range(len(qlist))
            )
            + ")"
        )
        terms.append(
            F.element_at(
                F.element_at(maps_g, F.col("qp") + 1), F.col(f"code_{g}")
            )
        )
    adc = terms[0]
    for t in terms[1:]:
        adc = adc + t
    qmat = _dmat_sql([qv for _, qv in qlist])
    cand = idx.join(probes_df, "centroid_id").select(
        "query_id", "vec_id", "v", "qp", F.round(adc, 6).alias("approx_sim")
    )
    sw = Window.partitionBy("query_id").orderBy(
        F.desc("approx_sim"), F.asc("vec_id")
    )
    shortlist = (
        cand.withColumn("srn", F.row_number().over(sw))
        .filter(F.col("srn") <= rerank)
        .select("query_id", "vec_id", "v", "qp", "approx_sim")
    )
    kw = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        shortlist.select(
            "query_id",
            "vec_id",
            "approx_sim",
            F.round(
                V.cosine(F.col("v"), F.element_at(qmat, F.col("qp") + 1)), 6
            ).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(kw).cast("int"))
        .filter(F.col("rank") <= k)
    )


def knn_density_outliers(
    embeddings: DataFrame,
    k: int = 5,
    target_bucket: int = 64,
    cap: int = 96,
    n_rows: int | None = None,
) -> DataFrame:
    """kNN-density scoring for embedding-space data pruning (the
    SemDeDup/D4 family's ranking signal): each vector's mean cosine to
    its ``k`` nearest neighbors WITHIN its capped centroid sub-bucket.
    Low density = isolated/noisy sample; high density = redundant
    dense region — both ends are what curation prunes first.

    Same bounded machinery as :func:`nearest_neighbor_capped`: hard
    ≤cap sub-buckets, so every cosine matrix is ≤ cap×cap and total
    work is O(n·(√k + cap)·dims) — two-level assignment plus the
    capped per-bucket scan — at any corpus size (the r7-measured ×11.6
    blow-up was the old FLAT assignment's O(n·k) term, k ∝ n
    pre-clamp); recall is bucket-approximate, precision exact. Exactness: per-neighbor cosines are the 6-dp
    fold-order values, scaled to integer MICRO units and summed as
    longs (order-independent; a float top-k mean would depend on
    accumulation order), with ONE 4-dp division at the end (certified
    single-division precedent). Vectors with fewer than k in-bucket
    neighbors average over what exists; singleton sub-buckets emit no
    row (capped-family precedent). Output: vec_id, n_nbrs,
    knn_sum_micro, density (4 dp).
    """
    import pandas as pd

    bucketed = assign_centroids_capped(embeddings, target_bucket, cap, n_rows)

    def bucket_density(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id")
        if len(pdf) < 2:
            return pd.DataFrame(
                {"vec_id": [], "n_nbrs": [], "knn_sum_micro": []}
            )
        M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        S = _cos_matrix(M, M)  # 6-dp, fold-order bit-exact with the oracle
        np.fill_diagonal(S, -np.inf)
        kk = min(k, len(pdf) - 1)
        top = -np.sort(-S, axis=1)[:, :kk]
        micro = np.rint(top * 1e6).astype(np.int64).sum(axis=1)
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"].to_numpy(),
                "n_nbrs": np.full(len(pdf), kk, dtype=np.int64),
                "knn_sum_micro": micro,
            }
        )

    out = bucketed.groupBy("centroid_id", "sub_id").applyInPandas(
        bucket_density, "vec_id long, n_nbrs long, knn_sum_micro long"
    )
    return out.select(
        "vec_id",
        "n_nbrs",
        "knn_sum_micro",
        F.round(F.col("knn_sum_micro") / (F.col("n_nbrs") * F.lit(1e6)), 4).alias(
            "density"
        ),
    )


def label_separation_matrix(embeddings: DataFrame) -> DataFrame:
    """Pairwise cosine between LABEL centroids — the class-separation
    audit an embedding pipeline reads next to
    :func:`embedding_profile`'s norm drift: two labels whose centroids
    sit at cosine ≈ 1 are indistinguishable to any downstream
    classifier/router, and a label whose centroid drifts toward
    another's shows up here before accuracy drops.

    Mechanics — the :func:`embedding_centroids` aggregate-a-vector
    pattern: posexplode → per-(label, pos) component mean rounded to
    6 dp (cross-engine float-sum order can't flip the value), then the
    pairwise dot/norms are computed on the CENTROID frame only —
    |labels| × dims rows, planning-sized at any corpus scale, so the
    pos-equijoined self-join is trivially broadcastable and no
    vector-sized shuffle exists beyond the one component aggregate.

    Exactness: component means 6-dp-rounded before any product
    (embedding_centroids precedent); norms and the cosine are each one
    sqrt/division + 6-dp round. Output: label_a, label_b, n_a, n_b,
    centroid_cos — one row per unordered label pair (labels counted
    over rows with a non-empty embedding — the rows the centroid is
    actually the mean of).

    Single-scan: the component aggregate is materialized once
    (|labels|×dims rows) and EVERY downstream branch — norms, label
    counts (max per-pos row count == rows with len ≥ 1), and both
    sides of the pairwise self-join — reads that frame; without it
    the plan re-scanned the corpus and re-ran the posexplode
    aggregate per branch (the r6 single-scan-sweep hazard).
    """
    base = valid_embeddings(embeddings).select(
        "label", V.to_double_array(F.col("embedding")).alias("v")
    )
    ex = base.select("label", F.posexplode("v").alias("pos", "val"))
    comp = ex.groupBy("label", "pos").agg(
        F.round(F.avg("val"), 6).alias("m"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    ).transform(materialize)
    norms = comp.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 6).alias("nrm")
    )
    counts = comp.groupBy("label").agg(F.max("cnt").alias("n"))
    a, b = comp.alias("a"), comp.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .agg(F.sum(F.col("a.m") * F.col("b.m")).alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("nrm").alias("nrm_a"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("nrm").alias("nrm_b"))
    ca = counts.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .join(F.broadcast(ca), "label_a")
        .join(F.broadcast(cb), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            F.round(F.col("dot") / (F.col("nrm_a") * F.col("nrm_b")), 6).alias(
                "centroid_cos"
            ),
        )
        .orderBy("label_a", "label_b")
    )


def embedding_drift(
    embeddings: DataFrame,
    n_epochs: int = 10,
    n_bits: int = 8,
    dims: int = 64,
) -> DataFrame:
    """Embedding-space distribution drift across ingestion epochs — the
    vector twin of ``text.vocab_drift``: per adjacent epoch pair, the
    total-variation distance between SRP-bucket occupancy distributions
    plus bucket churn. A drifting TV says the embedding distribution
    (upstream model, content mix, or preprocessing) changed between
    cuts; the fixed 2^n_bits bucket domain makes epochs comparable
    without any fitted artifact.

    Scale: the SRP signature is a PURE per-row expression over
    md5-derived hyperplanes (:func:`srp_signature_expr` — no corpus
    statistics, no centroids, no state), so the whole op is one scan,
    one (epoch, bucket) count aggregate over a ≤ n_epochs × 2^n_bits
    domain, and a bucket-keyed fold to ≤ n_epochs − 1 rows. Epochs are
    the positional ``(vec_id * n_epochs) div (max_id + 1)`` ranges
    (the ``text.ngram_novelty`` rule). Shares are integer micro-units
    over exact BIGINTs. Output: epoch_from, epoch_to, union_buckets,
    new_buckets, dropped_buckets, tv_micro.
    """
    # drift is a geometry statistic: compute-valid vectors only (the
    # guard also keeps epoch boundaries and bucket counts consistent
    # between engines on corpora with degenerate rows — r15 sweep)
    ve = valid_embeddings(embeddings).filter(F.col("vec_id").isNotNull())
    n = ve.agg((F.max("vec_id") + 1).alias("n"))
    counts = (
        ve.crossJoin(F.broadcast(n))
        .select(
            F.expr(f"(vec_id * {int(n_epochs)}) div n").alias("epoch"),
            F.expr(
                srp_signature_expr("embedding", n_bits=n_bits, dims=dims)
            ).alias("bucket"),
        )
        .groupBy("epoch", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .transform(materialize)
    )
    totals = counts.groupBy("epoch").agg(F.sum("cnt").cast("long").alias("tot"))
    shares = counts.join(F.broadcast(totals), "epoch").select(
        "epoch", "bucket", F.expr("(cnt * 1000000) div tot").alias("share")
    )
    cur = shares.select(
        F.col("epoch").alias("epoch_to"), "bucket", F.col("share").alias("p")
    )
    prev = shares.select(
        (F.col("epoch") + 1).alias("epoch_to"),
        "bucket",
        F.col("share").alias("q"),
    ).filter(F.col("epoch_to") < int(n_epochs))
    joined = cur.join(prev, ["epoch_to", "bucket"], "full_outer").filter(
        F.col("epoch_to") >= 1
    )
    return (
        joined.groupBy("epoch_to")
        .agg(
            F.count(F.lit(1)).cast("long").alias("union_buckets"),
            F.sum(F.when(F.col("q").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("new_buckets"),
            F.sum(F.when(F.col("p").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("dropped_buckets"),
            F.sum(
                F.abs(
                    F.coalesce(F.col("p"), F.lit(0))
                    - F.coalesce(F.col("q"), F.lit(0))
                )
            )
            .cast("long")
            .alias("tv_micro"),
        )
        .select(
            (F.col("epoch_to") - 1).alias("epoch_from"),
            "epoch_to",
            "union_buckets",
            "new_buckets",
            "dropped_buckets",
            "tv_micro",
        )
        .orderBy("epoch_to")
    )


def clustering_silhouette(
    embeddings: DataFrame, n_centroids: int = 16
) -> DataFrame:
    """Per-cluster cosine silhouette — the clustering-QUALITY audit the
    balance audit can't give (:func:`cluster_balance_audit` says buckets
    are evenly sized; silhouette says vectors actually BELONG to their
    bucket): s = (b − a) / max(a, b) with a = cosine distance to the
    assigned centroid and b = distance to the best OTHER centroid
    (the standard simplified/centroid silhouette — full pairwise
    silhouette is O(n²) by definition and stays out).

    Exactness: cosines are the certified 6-dp rounds; a and b become
    exact micro longs, and both the per-vector ratio and the per-cluster
    mean are sign-split integral divisions (negative ``div`` truncates
    differently across engines, so the sign is factored out first).

    Plan shape: one broadcast-centroid cross score (n × k narrow rows,
    never materialized wide), then a rank ≤ 2 window partitioned by
    vec_id — Spark compiles the filter to WindowGroupLimit, so map
    tasks pre-trim to two rows per vector BEFORE the exchange (the
    :func:`knn_batch` precedent); the rollup is one map-side-combined
    aggregate over the bounded cluster domain. Fixed ``n_centroids`` is
    the oracle-anchor family (assign_centroids); at corpus scale the
    same silhouette composes over ``assign_centroids_capped``'s
    adaptive buckets with b restricted to probed centroids.
    Output: cluster_id, n_vecs, mean_silhouette_micro, ordered by
    cluster_id.
    """
    assert n_centroids >= 2, "silhouette needs a second-best centroid"
    e = _as_double(embeddings)
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        F.round(V.cosine(F.col("v"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos_sim"), F.asc("centroid_id")
    )
    top2 = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    micro = F.round((1 - F.col("cos_sim")) * 1e6, 0).cast("long")
    per_vec = top2.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("centroid_id"))).alias("cluster_id"),
        F.max(F.when(F.col("rn") == 1, micro)).alias("a_micro"),
        F.max(F.when(F.col("rn") == 2, micro)).alias("b_micro"),
    )
    s_micro = F.expr(
        "CASE WHEN b_micro - a_micro >= 0 THEN "
        "((b_micro - a_micro) * 1000000) div greatest(greatest(a_micro, b_micro), 1) "
        "ELSE -(((a_micro - b_micro) * 1000000) "
        "div greatest(greatest(a_micro, b_micro), 1)) END"
    )
    return (
        per_vec.select("cluster_id", s_micro.cast("long").alias("s_micro"))
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("s_micro").cast("long").alias("ssum"),
        )
        .select(
            "cluster_id",
            "n_vecs",
            F.expr(
                "CASE WHEN ssum >= 0 THEN ssum div n_vecs "
                "ELSE -((-ssum) div n_vecs) END"
            )
            .cast("long")
            .alias("mean_silhouette_micro"),
        )
        .orderBy("cluster_id")
    )


def hard_negatives(
    embeddings: DataFrame,
    target_bucket: int = 64,
    cap: int = 96,
    n_rows: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training — per anchor, the
    most-similar vector with a DIFFERENT label: the pair-construction
    step every embedding-model training pipeline runs (hard negatives
    carry the gradient signal; random negatives are trivially
    separable). Same approximate-recall/exact-precision contract as
    :func:`nearest_neighbor_capped`: candidates are restricted to the
    anchor's hard-capped sub-bucket (two-level assignment, ≈2·√k
    cosines per row + one ≤cap×cap matrix per bucket), so the mined
    negative is the hardest LOCAL one — exactly the trade ANN-based
    miners (FAISS-backed) make at production scale.

    Anchors whose bucket holds no other-label vector emit no row
    (mirrored by the oracle); null labels group under -1. Cosines are
    the boundary-verified 6-dp ``_cos_matrix`` values, ties break to
    the lowest neg_id (ascending-sorted buckets + argmax). Output:
    vec_id, label, neg_id, neg_label, cos_sim.
    """
    import pandas as pd

    bucketed = assign_centroids_capped(embeddings, target_bucket, cap, n_rows)
    lab = embeddings.select(
        "vec_id", F.coalesce(F.col("label"), F.lit(-1)).cast("long").alias("label")
    )
    joined = bucketed.join(lab, "vec_id")

    out_schema = (
        "vec_id long, label long, neg_id long, neg_label long, cos_sim double"
    )

    def bucket_neg(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id")  # asc → argmax = lowest neg_id on ties
        labels = pdf["label"].to_numpy()
        if len(pdf) < 2 or (labels == labels[0]).all():
            return pd.DataFrame(
                {c.split(" ")[0]: [] for c in out_schema.split(", ")}
            )
        M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        S = _cos_matrix(M, M)
        S[labels[:, None] == labels[None, :]] = -np.inf  # self included
        ids = pdf["vec_id"].to_numpy()
        j = np.argmax(S, axis=1)
        rows = np.arange(len(ids))
        ok = np.isfinite(S[rows, j])
        return pd.DataFrame(
            {
                "vec_id": ids[ok],
                "label": labels[ok],
                "neg_id": ids[j[ok]],
                "neg_label": labels[j[ok]],
                "cos_sim": S[rows[ok], j[ok]],
            }
        )

    return joined.groupBy("centroid_id", "sub_id").applyInPandas(
        bucket_neg, out_schema
    )


def contrastive_triplets(
    embeddings: DataFrame,
    target_bucket: int = 64,
    cap: int = 96,
    n_rows: int | None = None,
) -> DataFrame:
    """Triplet mining for contrastive training — per anchor, the
    hardest (anchor, positive, negative) triple within its hard-capped
    sub-bucket: positive = most-similar SAME-label vector, negative =
    most-similar DIFFERENT-label vector (:func:`hard_negatives`'
    selection), plus the triplet MARGIN cos(a,p) − cos(a,n) — the
    quantity a triplet/InfoNCE loss actually trains on, and the mining
    report real pipelines use to pick margin hyperparameters (a mostly
    negative-margin corpus means the labels or the embedder are broken).

    Same approximate-recall/exact-precision contract and cost shape as
    :func:`hard_negatives` (≈2·√k assignment cosines per row + one
    ≤cap×cap matrix per bucket — ONE matrix serves both selections).
    Anchors lacking a same-label or different-label bucket-mate emit no
    row (a triplet needs both; oracle-mirrored). Cosines are 6-dp
    boundary-verified; the margin is exact integer micro-units of the
    rounded cosines, so the sign is engine-stable. Ties break to the
    lowest pos_id/neg_id. Output: vec_id, label, pos_id, cos_pos,
    neg_id, cos_neg, margin_micro.
    """
    import pandas as pd

    bucketed = assign_centroids_capped(embeddings, target_bucket, cap, n_rows)
    lab = embeddings.select(
        "vec_id", F.coalesce(F.col("label"), F.lit(-1)).cast("long").alias("label")
    )
    joined = bucketed.join(lab, "vec_id")

    out_schema = (
        "vec_id long, label long, pos_id long, cos_pos double, "
        "neg_id long, cos_neg double, margin_micro long"
    )

    def bucket_triplets(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("vec_id")  # asc → argmax = lowest id on ties
        labels = pdf["label"].to_numpy()
        cols = [c.split(" ")[0] for c in out_schema.split(", ")]
        if len(pdf) < 3:
            return pd.DataFrame({c: [] for c in cols})
        M = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        S = _cos_matrix(M, M)
        same = labels[:, None] == labels[None, :]
        Sp = S.copy()
        Sp[~same] = -np.inf
        np.fill_diagonal(Sp, -np.inf)  # self is not a positive
        Sn = S.copy()
        Sn[same] = -np.inf  # self is same-label → excluded already
        ids = pdf["vec_id"].to_numpy()
        jp = np.argmax(Sp, axis=1)
        jn = np.argmax(Sn, axis=1)
        rows = np.arange(len(ids))
        ok = np.isfinite(Sp[rows, jp]) & np.isfinite(Sn[rows, jn])
        cp = Sp[rows[ok], jp[ok]]
        cn = Sn[rows[ok], jn[ok]]
        margin = np.rint(cp * 1e6).astype(np.int64) - np.rint(cn * 1e6).astype(
            np.int64
        )
        return pd.DataFrame(
            {
                "vec_id": ids[ok],
                "label": labels[ok],
                "pos_id": ids[jp[ok]],
                "cos_pos": cp,
                "neg_id": ids[jn[ok]],
                "cos_neg": cn,
                "margin_micro": margin,
            }
        )

    return joined.groupBy("centroid_id", "sub_id").applyInPandas(
        bucket_triplets, out_schema
    )


def filtered_ivf_knn(
    embeddings: DataFrame,
    query_id: int = 0,
    label: int = 3,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 1,
) -> DataFrame:
    """Filtered vector search — IVF top-k restricted to a metadata
    predicate (``label == target``), with SELECTIVITY-WIDENED probing:
    the named hard problem of production vector stores (a fixed probe
    count tuned for unfiltered search under-recalls once a filter
    removes most candidates from the probed buckets; the standard fix —
    what FAISS/Qdrant-style engines do — is to widen the probe set by
    the filter's inverse selectivity).

    Here: n_probe_eff = min(n_centroids, ⌈n_probe · n_total /
    n_filtered⌉) from ONE planning-sized count aggregate (exact integer
    ceiling division, engine-portable), then the :func:`ivf_knn` zero-
    exchange serving scan with the label predicate applied AT THE SCAN
    (pushdown-eligible — the filter prunes rows before any cosine is
    computed, so cost is n_filtered·√k assignment work, not corpus).
    An empty filter yields an empty result (oracle-mirrored). Output:
    vec_id, label, cos_sim (6 dp), top-k by (cos DESC, vec_id).
    """
    e = valid_embeddings(embeddings).select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        F.coalesce(F.col("label"), F.lit(-1)).cast("long").alias("label"),
    )
    # ONE corpus scan for the selectivity counts AND the centroid/query
    # head fetch (r15): both needed a full pass over ``e`` (a 1-row
    # aggregate and a 16-row filter-collect) and ran as two sequential
    # construct-time jobs — at 100 TB that is twice the construct I/O.
    # Fused: the head rows ride the same aggregate as a bounded
    # collect_list (when() without otherwise yields NULL for non-head
    # rows, which collect_list drops), so construct scans the corpus
    # exactly once.
    agg_row = e.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count(F.when(F.col("label") == label, 1)).cast("long").alias("n_filtered"),
        F.collect_list(
            F.when(
                (F.col("vec_id") < n_centroids) | (F.col("vec_id") == query_id),
                F.struct("vec_id", "v"),
            )
        ).alias("head"),
    ).collect()[0]
    n_total, n_filtered = agg_row["n_total"], agg_row["n_filtered"]
    if n_filtered == 0:
        return e.select("vec_id", "label", F.lit(0.0).alias("cos_sim")).limit(0)
    n_probe_eff = min(
        int(n_centroids), (int(n_probe) * n_total + n_filtered - 1) // n_filtered
    )
    by_id = {r["vec_id"]: [float(x) for x in r["v"]] for r in agg_row["head"]}
    if query_id not in by_id:
        return e.select("vec_id", "label", F.lit(0.0).alias("cos_sim")).limit(0)
    qv = by_id[query_id]
    qlit = F.array(*[F.lit(x) for x in qv])
    cent_rows = [
        (int(cid), by_id[cid]) for cid in sorted(by_id) if cid < n_centroids
    ]
    if not cent_rows:
        return e.select("vec_id", "label", F.lit(0.0).alias("cos_sim")).limit(0)
    spark = embeddings.sparkSession
    cents_local = spark.createDataFrame(
        cent_rows, "centroid_id long, cv array<double>"
    )
    probe_rows = (
        cents_local.select(
            "centroid_id",
            F.round(V.cosine(F.col("cv"), qlit), 6).alias("c_sim"),
            V.norm(F.col("cv")).alias("na"),
            V.norm(qlit).alias("nq"),
        )
        .orderBy(F.desc("c_sim"), F.asc("centroid_id"))
        .collect()
    )
    probed = [r["centroid_id"] for r in probe_rows[: int(n_probe_eff)]]
    nmap = {r["centroid_id"]: r["na"] for r in probe_rows}
    cent_norms = [nmap[cid] for cid, _ in cent_rows]
    nq_lit = F.expr(f"CAST('{probe_rows[0]['nq']!r}' AS DOUBLE)")
    cid_col = _let(
        {"nv": V.norm(F.col("v"))},
        lambda s: _inline_best(F.col("v"), cent_rows, cent_norms, s["nv"]),
    ).getField("cid")
    return (
        e.filter(F.col("label") == label)  # scan-side predicate first
        .withColumn("cid", cid_col)
        .filter(F.col("cid").isin(probed))
        .select(
            "vec_id",
            "label",
            F.round(
                V.dot(F.col("v"), qlit) / (V.norm(F.col("v")) * nq_lit), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def coreset_selection(embeddings: DataFrame, k: int = 8) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985, public; the
    2-approximation behind k-Center data pruning / active-learning
    seed picks) — choose ``k`` maximally-spread vectors: seed = lowest
    vec_id, then k−1 rounds of "farthest point from the chosen set".
    A coreset is the data-SELECTION primitive (which ROWS represent
    the corpus) next to :func:`kmeans_embeddings`' synthetic centroids
    and :func:`embedding_prototypes`' per-label means.

    Determinism: distances are pure integers after the repo's 6-dp
    cosine rounding — d_micro = 1e6 − round(round(cos, 6)·1e6), the
    min over chosen centers and the argmax over vectors are integer
    comparisons with lowest-vec_id ties, so the DuckDB oracle replays
    the loop as an unrolled CTE chain (the :func:`kmeans_embeddings`
    discipline). Already-chosen vectors sit at d = 0 and can't repeat.

    Eager contract (the :func:`ivf_knn` note): each round runs one
    corpus scan computing ≤ r cosines per row against the ≤ k
    broadcast-literal centers and collects ONE row — k scans total,
    never more than k·k cosines per vector; at 100 TB the scan
    dominates and the round count is the k the caller asked for.
    Output: rank (selection order), vec_id, dist_micro (the max-min
    distance at selection; 0 for the seed).
    """
    e = _as_double(embeddings)
    seed_rows = e.orderBy("vec_id").limit(1).collect()
    if not seed_rows:
        return e.sparkSession.createDataFrame(
            [], "rank int, vec_id long, dist_micro long"
        )
    seed = seed_rows[0]
    picked = [(1, int(seed["vec_id"]), 0)]
    center_vecs = [[float(x) for x in seed["v"]]]
    for rank in range(2, int(k) + 1):
        # min over centers of (1e6 − cos_micro) == 1e6 − max over
        # centers of cos_micro (exact integer identity). The centers
        # ride in ONE ArrayType literal and the per-center similarity
        # is ONE transform lambda — round r used to build r separate
        # cosine expression trees (F.least over per-center F.array
        # literals), so every round re-paid codegen linear in r; the
        # matrix fold keeps the compiled expression size constant
        # per round (r15; same rounding, same values).
        cmat = F.lit(center_vecs)
        idx = F.sequence(F.lit(0), F.lit(len(center_vecs) - 1))
        dm = F.lit(1000000) - F.array_max(
            F.transform(
                idx,
                lambda i: F.round(
                    F.round(
                        V.cosine(F.col("v"), F.element_at(cmat, i + 1)), 6
                    )
                    * 1e6,
                    0,
                ).cast("long"),
            )
        )
        rows = (
            e.select("vec_id", "v", dm.alias("dm"))
            .orderBy(F.desc("dm"), F.asc("vec_id"))
            .limit(1)
            .collect()
        )
        if not rows or int(rows[0]["dm"]) <= 0:
            # max-min distance 0: every remaining vector coincides with
            # a chosen center (k > effective corpus diversity) — more
            # picks add no coverage and would re-emit chosen ids. The
            # max-min distance is monotone non-increasing, so stopping
            # here equals the oracle's dm > 0 row filter.
            break
        pick = rows[0]
        picked.append((rank, int(pick["vec_id"]), int(pick["dm"])))
        center_vecs.append([float(x) for x in pick["v"]])
    return e.sparkSession.createDataFrame(
        picked, "rank int, vec_id long, dist_micro long"
    ).orderBy("rank")


def update_ann_index(
    new_embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    m: int = 4,
    ks: int = 16,
    dims: int = 64,
) -> list[int]:
    """Incremental maintenance for a :func:`write_ann_index` layout —
    the IVM-for-ANN a 100 TB corpus needs: a daily crawl delta is a
    fraction of the corpus, and rebuilding the whole index to admit it
    re-pays the full corpus scan + write. This assigns ONLY the new
    vectors against the index's STORED centroids and quantizes them
    against its STORED codebook (both read from the tiny
    ``{path}/centroids`` file — never recomputed, so code/bucket
    meanings are stable across updates), then rewrites ONLY the
    affected centroid partitions.

    Exactly-once discipline (the ``compact_ivm_partials`` rules): the
    rewrite is ONE dynamic-partition-overwrite job whose content is
    (existing rows of affected partitions ANTI-JOINED on vec_id) ∪ new
    rows — re-running the same delta replaces those partitions with
    identical content (idempotent), a crash before commit leaves only
    ``_temporary`` debris, and untouched partitions are never listed,
    read, or rewritten. Equivalence contract (pinned by test): after
    updating with a delta, the index — and every
    :func:`ivfpq_knn_indexed` answer — is bit-identical to a full
    rebuild over the union, provided the first max(n_centroids, ks)
    vec_ids were in the original corpus (centroid/codebook stability,
    the same data-derived-centroid rule every op here uses).

    Returns the affected centroid ids (bounded by ``n_centroids`` —
    callers log them as the maintenance audit trail).
    """
    spark = new_embeddings.sparkSession
    e = _as_double(new_embeddings)
    cents = spark.read.parquet(f"{path}/centroids")
    cents_idx = cents.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("cv")
    )
    scored = e.crossJoin(F.broadcast(cents_idx)).select(
        "vec_id",
        "centroid_id",
        F.round(V.cosine(F.col("v"), F.col("cv")), 6).alias("cos_sim"),
    )
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cos_sim")).alias("nc"),
                    F.col("centroid_id").alias("cid"),
                )
            ).alias("w")
        )
        .select("vec_id", F.col("w.cid").alias("centroid_id"))
    )
    codebook = cents.select("vec_id", F.col("cv").alias("embedding"))
    codes = pq_codes(new_embeddings, m, ks, dims, codebook=codebook)
    cols = ["vec_id", "v"] + [f"code_{g}" for g in range(m)] + ["centroid_id"]
    new_rows = (
        e.join(assigned, "vec_id").join(codes, "vec_id").select(*cols)
    ).transform(materialize)
    affected = sorted(
        r["centroid_id"]
        for r in new_rows.select("centroid_id").distinct().collect()
    )
    if not affected:
        return []
    # materialize the surviving old rows BEFORE the overwrite: the
    # write targets the same path the read plans against, and lazy
    # self-read-overwrite is committer/version-sensitive (Spark's
    # "cannot overwrite a path that is also being read from" check, or
    # a non-atomic committer exposing partially-deleted partitions
    # mid-job) — cutting lineage here makes the merge content a fact
    # on the cluster, not a plan over the files being replaced
    old = (
        spark.read.parquet(f"{path}/index")
        .filter(F.col("centroid_id").isin(affected))
        .join(new_rows.select("vec_id"), "vec_id", "left_anti")
        .select(*cols)
    ).transform(materialize)
    merged = old.unionByName(new_rows.select(*cols))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            merged.repartition("centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(f"{path}/index")
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return affected


def embedding_dimension_health(embeddings: DataFrame) -> DataFrame:
    """Per-DIMENSION embedding health — the collapsed-encoder audit
    that :func:`embedding_profile`'s per-label norms can't see: a
    dimension whose variance pins to ~0 is dead weight in every
    similarity computation (undertrained projection, an always-zero
    feature, or rank collapse), and production embedding pipelines
    track the per-dimension variance spectrum per model release.

    Plan: ONE posexplode projection (dims narrow rows per vector, no
    join), then a |dims|-group map-side-combinable aggregate — vectors
    never shuffle whole. Exactness: components are rounded once to
    integer micro (means) and milli (second moments); the variance is
    the schoolbook two-step integral division
    (Σs² div n) − (Σs div n)², each term ≤ 1e6 at ANY corpus size, so
    nothing overflows and both engines floor identically. ``is_dead``
    flags variance 0 in milli² — i.e. the component spread is under
    the milli quantization floor. Output: pos, n_vectors, mean_micro,
    var_milli2, is_dead — one row per dimension, ordered by pos.
    """
    # CENSUS semantics: every stored component counts, zero-norm
    # vectors included (they are exactly what a collapsed encoder
    # emits) — raw column, not the valid_embeddings funnel; posexplode
    # skips NULL/empty vectors on its own, matching the raw oracle
    ex = embeddings.select(
        V.to_double_array(F.col("embedding")).alias("v")
    ).select(
        F.posexplode("v").alias("pos", "val")
    ).select(
        "pos",
        F.round(F.col("val") * 1e6, 0).cast("long").alias("s_micro"),
        F.round(F.col("val") * 1e3, 0).cast("long").alias("s_milli"),
    )
    agg = ex.groupBy("pos").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("s_micro").alias("sum_micro"),
        F.sum("s_milli").alias("sum_milli"),
        F.sum(F.col("s_milli") * F.col("s_milli")).alias("sum_sq_milli"),
    )
    return agg.select(
        "pos",
        "n_vectors",
        F.expr("sum_micro div n_vectors").cast("long").alias("mean_micro"),
        F.expr(
            "(sum_sq_milli div n_vectors) - "
            "(sum_milli div n_vectors) * (sum_milli div n_vectors)"
        )
        .cast("long")
        .alias("var_milli2"),
    ).select(
        "pos",
        "n_vectors",
        "mean_micro",
        "var_milli2",
        (F.col("var_milli2") <= 0).cast("int").alias("is_dead"),
    ).orderBy("pos")
