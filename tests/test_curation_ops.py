"""Unit tests for the curation-pass operators added in round 2
(repetition quality signals, PII redaction, int8 quantization) on
planted data — semantics pinned independently of the oracle harness."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from data_pipeline_example_spark.operators import similarity, text


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, "en", "unit", t) for i, t in enumerate(rows)],
        "doc_id long, lang string, source string, text string",
    )


def test_repetition_stats_flags_repetitive_doc(spark):
    docs = _docs(
        spark,
        [
            "spam spam spam spam spam",          # one bigram, repeated 4x
            "alpha beta gamma delta epsilon",    # all distinct bigrams
            "one",                               # no bigrams -> no row
        ],
    )
    got = {r["doc_id"]: r for r in text.repetition_stats(docs).collect()}
    assert set(got) == {0, 1}
    assert got[0]["n_bigrams"] == 4
    assert got[0]["top_bigram_n"] == 4
    assert got[0]["top_bigram_ratio"] == 1.0
    assert got[0]["distinct_bigram_ratio"] == 0.25
    assert got[1]["top_bigram_ratio"] == 0.25
    assert got[1]["distinct_bigram_ratio"] == 1.0


def test_redact_pii_counts_and_fingerprint(spark):
    raw = "call 12345678 or mail a.user+tag@example.co.uk twice 9876543210"
    docs = _docs(spark, [raw, "clean text with no pii", None])
    got = {r["doc_id"]: r for r in text.redact_pii(docs).collect()}
    assert got[0]["n_emails"] == 1
    assert got[0]["n_numbers"] == 2
    expected = "call <NUM> or mail <EMAIL> twice <NUM>"
    assert got[0]["redacted_fp"] == hashlib.md5(expected.encode()).hexdigest()
    # clean doc: zero counts, fingerprint of the unchanged text
    assert got[1]["n_emails"] == 0 and got[1]["n_numbers"] == 0
    assert (
        got[1]["redacted_fp"]
        == hashlib.md5(b"clean text with no pii").hexdigest()
    )
    # null text treated as empty
    assert got[2]["redacted_fp"] == hashlib.md5(b"").hexdigest()


def test_redact_short_numbers_survive(spark):
    docs = _docs(spark, ["room 42 on floor 123456"])  # under the 7-digit bar
    r = text.redact_pii(docs).collect()[0]
    assert r["n_numbers"] == 0
    assert r["redacted_fp"] == hashlib.md5(b"room 42 on floor 123456").hexdigest()


def test_quantize_embeddings_bounds_and_zero_vector(spark):
    vecs = spark.createDataFrame(
        [
            (0, [1.0, -2.0, 0.5]),
            (1, [0.0, 0.0, 0.0]),
            (2, [-0.25, 0.25, 0.125]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in similarity.quantize_embeddings(vecs).collect()}
    # max|v| maps to exactly +/-127; everything stays in int8 range
    assert got[0]["q_min"] == -127
    assert got[0]["q_max"] == 64  # 1.0 * (127/2) = 63.5 -> round-half-up 64
    assert got[0]["scale"] == 63.5
    assert got[1]["scale"] == 0.0
    assert got[1]["q_sum"] == 0 and got[1]["q_min"] == 0 and got[1]["q_max"] == 0
    assert -127 <= got[2]["q_min"] <= got[2]["q_max"] <= 127


def test_quantize_embeddings_whole_table_in_range(spark, sf_dir):
    from data_pipeline_example_spark.sources import load_table

    q = similarity.quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    bad = q.filter((F.col("q_min") < -127) | (F.col("q_max") > 127)).count()
    assert bad == 0
    assert q.filter(F.col("scale") <= 0).count() == 0  # no zero vectors in corpus
