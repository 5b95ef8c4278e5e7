"""Unit tests for the chunking / provenance-curation / event-analytics
operators (round 2): semantics pinned on planted data, independent of
the DuckDB oracle harness."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_pipeline_example_spark.operators import text, users


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, "en", f"src{i % 2}", t) for i, t in enumerate(rows)],
        "doc_id long, lang string, source string, text string",
    )


def _events(spark, rows):
    """rows: (user_id, event_type, ts_str, value)."""
    return spark.createDataFrame(
        [
            (i, u, e, datetime.datetime.fromisoformat(ts), v)
            for i, (u, e, ts, v) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )


# --- chunking -------------------------------------------------------------


def test_chunk_documents_overlap_and_tail(spark):
    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = _docs(spark, [words])
    got = sorted(
        text.chunk_documents(docs, chunk_size=4, stride=3).collect(),
        key=lambda r: r["chunk_id"],
    )
    # starts 0,3,6,9 -> sizes 4,4,4,1
    assert [r["chunk_id"] for r in got] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in got] == [4, 4, 4, 1]
    # consecutive chunks overlap by chunk_size - stride = 1 token:
    # chunk0 = w0..w3, chunk1 = w3..w6 — verified via hashes of the
    # expected texts
    import hashlib

    def h(s):
        return hashlib.md5(s.encode()).hexdigest()

    assert got[0]["chunk_hash"] == h("w0 w1 w2 w3")
    assert got[1]["chunk_hash"] == h("w3 w4 w5 w6")
    assert got[3]["chunk_hash"] == h("w9")


def test_chunk_documents_skips_empty(spark):
    docs = _docs(spark, ["", "   ", "one two"])
    got = text.chunk_documents(docs, chunk_size=4, stride=3).collect()
    assert {r["doc_id"] for r in got} == {2}


def test_chunk_dedup_stats_counts_repeats(spark):
    # two docs with identical text -> every chunk duplicated once
    words = " ".join(f"w{i}" for i in range(8))
    docs = _docs(spark, [words, words])
    row = text.chunk_dedup_stats(docs, chunk_size=4, stride=4).collect()[0]
    assert row["n_chunks"] == 4  # 2 docs x 2 chunks
    assert row["distinct_chunks"] == 2
    assert row["dup_rate"] == 0.5


# --- provenance blocklist -------------------------------------------------


def test_source_blocklist_drops_low_quality_source(spark):
    good = "the cat and the dog walked to the park and it is a good day " * 3
    bad = "x;;;;;;;;;;;;;;;;;;;;;;;;;;;;;"
    rows = [
        (0, "en", "good_src", good),
        (1, "en", "good_src", good),
        (2, "en", "bad_src", bad),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    got = text.source_blocklist_summary(docs).collect()
    assert len(got) == 1
    assert got[0]["lang"] == "en"
    assert got[0]["n_docs"] == 2
    assert got[0]["n_sources"] == 1


# --- event analytics ------------------------------------------------------


def test_value_anomalies_flags_spike(spark):
    rows = []
    for d in range(1, 11):
        rows.append((1, "view", f"2024-01-{d:02d}T00:00:00", 10.0))
    rows.append((1, "view", "2024-01-05T01:00:00", 500.0))  # day 5 spikes
    got = users.value_anomalies(_events(spark, rows)).collect()
    assert len(got) == 1
    assert got[0]["day"] == datetime.date(2024, 1, 5)
    assert got[0]["total_value"] == 510.0
    assert got[0]["z"] > 2.0


def test_retention_cohorts_triangle(spark):
    rows = [
        (1, "view", "2024-01-01T08:00:00", 1.0),
        (1, "view", "2024-01-03T08:00:00", 1.0),
        (2, "view", "2024-01-01T09:00:00", 1.0),
        (3, "view", "2024-01-02T09:00:00", 1.0),
        (3, "view", "2024-01-03T09:00:00", 1.0),
    ]
    got = {
        (r["cohort_day"].isoformat(), r["day_offset"]): r["active_users"]
        for r in users.retention_cohorts(_events(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # users 1, 2
        ("2024-01-01", 2): 1,  # user 1 back on day 3
        ("2024-01-02", 0): 1,  # user 3
        ("2024-01-02", 1): 1,  # user 3 back on day 3
    }


def test_event_funnel_is_order_sensitive(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "signup", "2024-01-01T00:00:00", 0.0),
        (1, "view", "2024-01-01T01:00:00", 0.0),
        (1, "click", "2024-01-01T02:00:00", 0.0),
        (1, "purchase", "2024-01-01T03:00:00", 0.0),
        # user 2: view BEFORE signup only -> stops at signup stage
        (2, "view", "2024-01-01T00:00:00", 0.0),
        (2, "signup", "2024-01-01T01:00:00", 0.0),
        # user 3: signup + view, click missing -> purchase doesn't count
        (3, "signup", "2024-01-01T00:00:00", 0.0),
        (3, "view", "2024-01-01T01:00:00", 0.0),
        (3, "purchase", "2024-01-01T02:00:00", 0.0),
        # user 4: never signed up
        (4, "view", "2024-01-01T00:00:00", 0.0),
    ]
    got = {r["stage"]: r["users"] for r in users.event_funnel(_events(spark, rows)).collect()}
    assert got == {"signup": 3, "view": 2, "click": 1, "purchase": 1}
    idx = {r["stage"]: r["stage_idx"] for r in users.event_funnel(_events(spark, rows)).collect()}
    assert idx == {"signup": 0, "view": 1, "click": 2, "purchase": 3}


def test_range_join_counts_band_semantics(spark):
    from data_pipeline_example_spark.operators import asof

    rows = [
        (1, "purchase", "2024-01-01T12:00:00", 5.0),
        (1, "error", "2024-01-01T11:55:00", 0.0),   # exactly -300s -> in
        (1, "error", "2024-01-01T12:05:00", 0.0),   # exactly +300s -> in
        (1, "error", "2024-01-01T12:05:01", 0.0),   # +301s -> out
        (2, "error", "2024-01-01T12:00:00", 0.0),   # other user -> out
        (2, "purchase", "2024-01-01T00:00:00", 1.0),  # no nearby errors
    ]
    got = {
        r["purchase_id"]: r["n_nearby"]
        for r in asof.range_join_counts(_events(spark, rows)).collect()
    }
    assert got == {0: 2, 5: 0}


def test_frequent_terms_exact_threshold(spark):
    # 'hot' appears 10/19 tokens; all others far below the eps=0.3
    # threshold of ceil(0.3*19)=6
    docs = _docs(
        spark,
        ["hot " * 10 + "a b c d e f g h i"],
    )
    got = {r["term"]: r["n_occurrences"] for r in text.frequent_terms(docs, eps=0.3).collect()}
    assert got == {"hot": 10}


def test_frequent_terms_matches_exact_counts(spark, sf_dir):
    from data_pipeline_example_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["term"]: r["n_occurrences"] for r in text.frequent_terms(docs).collect()
    }
    exploded = docs.select(
        F.explode(F.regexp_extract_all(F.lower(F.coalesce("text", F.lit(""))), F.lit("([a-z0-9]+)"), 1)).alias("term")
    )
    n = exploded.count()
    import math

    thr = math.ceil(0.005 * n)
    want = {
        r["term"]: r["n"]
        for r in exploded.groupBy("term").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= thr).collect()
    }
    assert got == want


def test_unigram_scores_rare_tokens_score_higher(spark):
    # 'common' dominates the corpus; doc 1 is all rare tokens
    docs = _docs(
        spark,
        ["common common common common common common common common",
         "rare1 rare2 rare3 rare4"],
    )
    got = {r["doc_id"]: r for r in text.unigram_scores(docs).collect()}
    import math

    # p(common) = 8/12 -> -log2 = log2(12/8); p(rare_i) = 1/12
    assert got[0]["n_tokens"] == 8
    assert got[0]["avg_neg_log2p"] == round(math.log2(12 / 8), 4)
    assert got[1]["avg_neg_log2p"] == round(math.log2(12), 4)
    assert got[1]["avg_neg_log2p"] > got[0]["avg_neg_log2p"]


def test_cdc_chunks_edit_stability(spark):
    """The CDC property fixed windows lack: inserting a token early in
    the document changes ONLY the chunk containing the edit — every
    chunk hash after the next boundary survives verbatim (boundaries
    re-synchronize), while chunk_documents-style fixed windows would
    shift all downstream slices."""
    from data_pipeline_example_spark.operators import text as text_ops

    base = "the data big table query slow fast scan merge sort key value"
    # insert one token inside the FIRST chunk ("the data"): boundaries
    # at data/query/scan/value re-synchronize immediately after
    edited = "the hash data big table query slow fast scan merge sort key value"
    docs = spark.createDataFrame(
        [(1, base, "en", "s", 1), (2, edited, "en", "s", 1)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = text_ops.cdc_chunks(docs).collect()
    h1 = [r["chunk_hash"] for r in out if r["doc_id"] == 1]
    h2 = [r["chunk_hash"] for r in out if r["doc_id"] == 2]
    assert len(h1) == len(h2)           # same boundary structure
    assert h1[0] != h2[0]               # the edited chunk changes
    assert h1[1:] == h2[1:]             # every later chunk survives
    # token conservation: chunk sizes partition the token stream
    n1 = sum(r["n_tokens"] for r in out if r["doc_id"] == 1)
    assert n1 == len(base.split())
