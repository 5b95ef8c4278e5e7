"""Similarity search over embedding columns (``array<float>``).

LLM-data-pipeline extensions (BASELINE.json north star). Three operators:

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

Ordering for top-k uses the 6-dp-rounded cosine plus vec_id tie-break:
double-precision sums can differ in the last ulp across engines, and
ranking on the rounded value keeps result sets cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_example_spark.functions import vectors as V


def _as_double(df: DataFrame) -> DataFrame:
    return df.select("vec_id", V.to_double_array(F.col("embedding")).alias("v"))


def knn(embeddings: DataFrame, query_id: int = 0, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k neighbors of ``query_id`` (self included).

    Output: vec_id, cos_sim (6 dp).
    """
    e = _as_double(embeddings)
    q = e.filter(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    return (
        e.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(V.cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def nearest_neighbor_per_vector(embeddings: DataFrame) -> DataFrame:
    """For every vector: its top-1 neighbor (excluding itself).

    Output: vec_id, nn_id, cos_sim (6 dp). All-pairs O(n²) — the exact
    baseline the approximate paths are checked against.
    """
    e = _as_double(embeddings)
    a = e.select(F.col("vec_id"), F.col("v"))
    b = e.select(F.col("vec_id").alias("nn_id"), F.col("v").alias("nv"))
    scored = a.join(b, F.col("vec_id") != F.col("nn_id")).select(
        "vec_id",
        "nn_id",
        F.round(V.cosine(F.col("v"), F.col("nv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("nn_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def assign_centroids(embeddings: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Assign each vector to its nearest 'centroid' (cosine, tie-break
    lowest centroid id). Centroids = embeddings with vec_id < n_centroids.
    Output: vec_id, centroid_id. The centroid set is tiny → broadcast."""
    e = _as_double(embeddings)
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "centroid_id",
        F.round(V.cosine(F.col("v"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
    )


def cosine_dup_pairs(embeddings: DataFrame, threshold: float = 0.35) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b).

    All-pairs baseline: every pair scored with the UDF-free cosine,
    kept when >= threshold. Output: vec_a, vec_b, cos_sim (6 dp). This
    is the exact-recall reference; at corpus scale use
    ``cosine_dup_pairs_blocked`` (same output contract, candidate set
    restricted to same-centroid buckets).
    """
    e = _as_double(embeddings)
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(V.cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def cosine_dup_pairs_blocked(
    embeddings: DataFrame, threshold: float = 0.35, n_centroids: int = 16
) -> DataFrame:
    """Scale path for embedding near-dup: candidates limited to pairs
    assigned to the same centroid bucket, so the join is an equi-join on
    centroid_id instead of an all-pairs cross product — per-bucket cost
    is (n/k)² and buckets shuffle independently. Recall is approximate
    (a pair straddling two buckets is missed); precision exact.
    """
    e = _as_double(embeddings)
    assigned = assign_centroids(embeddings, n_centroids)
    ea = e.join(assigned, "vec_id")
    a = ea.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "centroid_id")
    b = ea.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "centroid_id")
    return (
        a.join(b, ["centroid_id"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(V.cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
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

    At scale, ``assign_centroids`` output is materialized once and
    partitioned by centroid_id; a query then reads only the probed
    partitions (partition pruning) instead of the full corpus.
    """
    e = _as_double(embeddings)
    assigned = assign_centroids(embeddings, n_centroids)
    q = e.filter(F.col("vec_id") == query_id).select(F.col("v").alias("qv"))
    cents = e.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    probed = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "centroid_id",
            F.round(V.cosine(F.col("cv"), F.col("qv")), 6).alias("c_sim"),
        )
        .orderBy(F.desc("c_sim"), F.asc("centroid_id"))
        .limit(n_probe)
        .select("centroid_id")
    )
    bucket_ids = assigned.join(F.broadcast(probed), "centroid_id").select("vec_id")
    return (
        e.join(bucket_ids, "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(V.cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
