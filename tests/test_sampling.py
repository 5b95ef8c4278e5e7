"""Unit tests for the deterministic sampling / pruning operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_example_spark.operators import sampling, tpch
from data_pipeline_example_spark.sources import load_table


def test_stratified_sample_deterministic_and_rate_shaped(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    s1 = sampling.stratified_sample(ev)
    s2 = sampling.stratified_sample(ev.repartition(7))  # partitioning-independent
    rows1 = sorted(r["event_id"] for r in s1.collect())
    rows2 = sorted(r["event_id"] for r in s2.collect())
    assert rows1 == rows2 and rows1

    totals = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    sampled = {r["event_type"]: r["n"] for r in s1.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    # error stratum keeps ~90%, click ~5% — the rates must actually bite
    assert sampled["error"] / totals["error"] > 0.6
    assert sampled.get("click", 0) / totals["click"] < 0.2


def test_stratified_sample_default_rate_for_unknown_stratum(spark):
    df = spark.createDataFrame(
        [(i, "mystery", float(i)) for i in range(500)],
        "event_id long, event_type string, value double",
    )
    n = sampling.stratified_sample(df).count()
    assert 0 < n < 120  # ~10% default, generous bounds


def test_reservoir_sample_exact_k_per_stratum(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = sampling.reservoir_sample(ev, k=7)
    per = {r["event_type"]: r["n"] for r in out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(per) == {"click", "error", "purchase", "signup", "view"}
    assert all(n == 7 for n in per.values())
    assert out.filter(F.col("rk") > 7).count() == 0
    # deterministic under repartitioning
    again = sampling.reservoir_sample(ev.repartition(5), k=7)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_value_quantile_sketch_ordered_and_near_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    rows = sampling.value_quantile_sketch(ev).collect()
    assert rows
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]
    exact = {
        r["event_type"]: r["q"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("q"))
        .collect()
    }
    for r in rows:  # nearest-rank vs interpolated: close, not equal
        assert abs(r["p50"] - exact[r["event_type"]]) <= max(1.0, 0.05 * exact[r["event_type"]])


def test_bloom_prune_preserves_exact_join_result(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pruned = tpch.bloom_pruned_brand_volume(li, part)
    dim = part.filter(F.col("p_size") >= 30).select("p_partkey", "p_brand")
    plain = (
        li.join(F.broadcast(dim), li["l_partkey"] == dim["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .orderBy("p_brand")
    )
    assert [tuple(r) for r in pruned.collect()] == [tuple(r) for r in plain.collect()]


def test_bloom_prune_is_broadcast_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    plan = tpch.bloom_pruned_brand_volume(li, part)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_priority_sample_is_weighted_and_exact_k(spark, sf_dir):
    """Exactly k rows; heavier documents are overrepresented (mean
    sampled weight well above the corpus mean); deterministic across
    repartitionings; TakeOrderedAndProject plan (no global sort)."""
    from pyspark.sql import functions as F

    from data_pipeline_example_spark.operators.sampling import priority_sample
    from data_pipeline_example_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    k = 50
    samp = priority_sample(docs, k=k)
    rows = samp.collect()
    assert len(rows) == min(k, docs.count())

    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = sum(r["weight"] for r in rows) / len(rows)
    assert sample_mean > corpus_mean  # weight-proportional inclusion

    again = priority_sample(docs.repartition(7), k=k).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in rows}

    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(samp._jdf.queryExecution(), "simple")
    assert "TakeOrderedAndProject" in plan
