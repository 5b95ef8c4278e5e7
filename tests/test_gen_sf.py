"""Scaling-harness guard: tools/gen_sf.py's upsample must preserve
schemas and per-key structure while decorrelating content — the
properties the BASELINE.md scaling measurement rests on."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_upsample_doubles_counts_and_decorrelates(spark, sf_dir, tmp_path):
    from gen_sf import upsample

    from data_pipeline_example_spark.sources import load_table

    dst = str(tmp_path / "sf2x")
    upsample(spark, sf_dir, dst, factor=2)

    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        n_src = load_table(spark, sf_dir, t).count()
        n_dst = load_table(spark, dst, t).count()
        assert n_dst == 2 * n_src, t
    # dimension tables stay fixed
    assert load_table(spark, dst, "region").count() == 5
    assert load_table(spark, dst, "nation").count() == 25

    # key shifting: replica 1's orderkeys occupy a disjoint range, and
    # per-key lineitem group sizes are preserved (join fan-out constant)
    src_li = load_table(spark, sf_dir, "lineitem")
    dst_li = load_table(spark, dst, "lineitem")
    src_max = src_li.agg({"l_orderkey": "max"}).collect()[0][0]
    assert dst_li.filter(f"l_orderkey > {src_max}").count() == src_li.count()
    src_groups = src_li.groupBy("l_orderkey").count().groupBy("count").count()
    dst_groups = dst_li.groupBy("l_orderkey").count().groupBy("count").count()
    # group-size histogram doubles in frequency, never in size
    dst_hist = {(size, 2 * n) for size, n in (tuple(r) for r in src_groups.collect())}
    assert {tuple(r) for r in dst_groups.collect()} == dst_hist

    # documents: replica 0 verbatim, replica 1 decorrelated (fused
    # tokens change the fingerprint) but token-structure preserved
    src_docs = load_table(spark, sf_dir, "documents")
    dst_docs = load_table(spark, dst, "documents")
    n_docs = src_docs.count()
    from pyspark.sql import functions as F

    orig = {r["doc_id"]: r["text"] for r in src_docs.limit(5).collect()}
    got = {
        r["doc_id"]: r["text"]
        for r in dst_docs.filter(F.col("doc_id").isin(*orig)).collect()
    }
    assert got == orig  # replica 0 untouched
    rep1 = dst_docs.filter(F.col("doc_id") >= n_docs)
    assert rep1.filter(F.col("text").contains("r1_")).count() == rep1.count()
    # exact-dup fingerprints must NOT collide across replicas
    from data_pipeline_example_spark.operators import dedup

    fp = dedup.exact_dedup(dst_docs)
    assert fp.filter("dup_count > 1").count() == dedup.exact_dedup(
        src_docs
    ).filter("dup_count > 1").count() * 2

    # embeddings: replica 1 jittered, never byte-identical to replica 0
    src_emb = load_table(spark, sf_dir, "embeddings")
    n_emb = src_emb.count()
    dst_emb = load_table(spark, dst, "embeddings")
    joined = (
        dst_emb.filter(F.col("vec_id") >= n_emb)
        .select((F.col("vec_id") - n_emb).alias("vec_id"), F.col("embedding").alias("e1"))
        .join(src_emb.select("vec_id", F.col("embedding").alias("e0")), "vec_id")
    )
    assert joined.filter(F.col("e1") == F.col("e0")).count() == 0
