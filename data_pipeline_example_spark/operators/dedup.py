"""Deduplication operators over the ``documents`` table.

LLM-data-pipeline extensions (BASELINE.json north star). Three tiers,
each with a different scale profile:

* ``exact_dedup`` — hash-groupBy on a normalized md5 fingerprint. One
  shuffle keyed by a 128-bit hash: uniform key distribution, no skew,
  works unchanged at 100 TB.
* ``minhash_lsh_pairs`` — MinHash signatures + banded LSH. The candidate
  join is keyed on (band, bucket), so only near-duplicates ever meet in
  a shuffle partition; candidate verification computes exact Jaccard
  with array built-ins. This is THE scale path for near-dedup: cost is
  O(docs × shingles) for signatures + O(candidate pairs), never O(n²).
  MinHash uses md5-derived hash functions (not Spark's murmur3) so the
  whole operator is bit-reproducible in ANSI SQL → oracle-checkable.
* ``jaccard_pairs`` — brute-force shingle-join n-gram Jaccard. Correct
  baseline and oracle for the LSH variant; the shingle inverted index
  bounds the blowup on natural text, but worst case is quadratic — at
  scale prefer ``minhash_lsh_pairs``.

No UDFs anywhere: shingling, hashing, min-over-array, intersection are
all Spark SQL built-ins (higher-order functions), JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_pipeline_example_spark.functions import text as T


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Exact dedup groups: one row per distinct normalized text.

    Output: fingerprint, keep_doc_id (min doc_id — the canonical survivor),
    dup_count. Downstream ``documents ⋈ keep_doc_id`` materializes the
    deduplicated corpus without ever comparing full texts.
    """
    return (
        documents.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def shingled(documents: DataFrame, k: int = 3) -> DataFrame:
    """doc_id + distinct k-token shingle array (empty arrays filtered —
    docs with < k tokens can never match anything)."""
    return documents.select(
        "doc_id", T.token_shingles(F.col("text"), k).alias("shingles")
    ).filter(F.size("shingles") > 0)


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / union, 4)


def jaccard_pairs(
    documents: DataFrame, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Brute-force n-gram Jaccard near-dup pairs (doc_a < doc_b).

    Exploded shingles self-join → intersection counts → Jaccard from
    per-doc set sizes. Group-bys are keyed on doc-id pairs (uniform).
    """
    sh = shingled(documents, k)
    ex = sh.select("doc_id", F.explode("shingles").alias("sh"))
    sizes = sh.select("doc_id", F.size("shingles").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    documents: DataFrame, k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """doc_id + shingle array + minhash signature array (length
    ``num_hashes``). Hash family i = md5(i || ':' || shingle) — portable
    across engines, uniform, and cheap (md5 is JVM-intrinsic)."""
    sh = shingled(documents, k)
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("shingles"), lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s))
                )
            )
            for i in range(num_hashes)
        ]
    )
    return sh.select("doc_id", "shingles", sig.alias("sig"))


def minhash_lsh_pairs(
    documents: DataFrame,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + banded-LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: signatures → per-band bucket id (md5 of the band's slice)
    → self-join on (band, bucket) → distinct candidate pairs → exact
    Jaccard via array_intersect on the carried shingle sets → threshold.
    Output matches ``jaccard_pairs`` (doc_a, doc_b, jaccard) restricted
    to LSH candidates — recall is probabilistic, precision exact.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(documents, k, num_hashes)
    buckets = sigs.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at(F.col("sig"), b * rows_per_band + j + 1)
                                    for j in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "shingles", "bb.band", "bb.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return candidates.select(
        "doc_a", "doc_b", _jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
