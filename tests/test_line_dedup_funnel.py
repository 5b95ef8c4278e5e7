"""Unit coverage for the round-5 continuation ops: corpus-wide line
dedup with reassembly, the quality-rule funnel, and the dedup-group
split leakage audit. The driver testdata documents are single-line, so
the multi-line / cross-document behavior is pinned here on synthetic
frames.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_example_spark.operators import dedup, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_cross_document_boilerplate(spark):
    banner = "please accept our cookie policy before you continue reading"
    rows = [
        (1, f"{banner}\nunique first body line with several words here"),
        (2, f"{banner}\nanother distinct body line with several words too"),
        (3, f"completely original document text with enough words\n{banner}"),
    ]
    out = {r["doc_id"]: r for r in text.line_dedup(_docs(spark, rows)).collect()}
    # first occurrence ordered by (doc_id, pos) survives: doc 1 keeps it
    assert out[1]["text_clean"].splitlines()[0] == banner
    assert out[1]["n_dropped"] == 0
    # later occurrences are dropped, order of surviving lines preserved
    assert out[2]["n_dropped"] == 1
    assert out[2]["text_clean"] == "another distinct body line with several words too"
    assert out[3]["n_dropped"] == 1
    assert out[3]["text_clean"] == "completely original document text with enough words"
    for r in out.values():
        assert r["n_lines"] == r["n_kept"] + r["n_dropped"]


def test_line_dedup_short_lines_never_dedup(spark):
    rows = [
        (1, "Title\n\nbody line with quite enough words here"),
        (2, "Title\n\nother body line with quite enough words here"),
    ]
    out = {r["doc_id"]: r for r in text.line_dedup(_docs(spark, rows)).collect()}
    # "Title" (<4 words) and blank lines repeat across docs but are kept
    assert out[2]["n_dropped"] == 0
    assert out[2]["text_clean"].splitlines() == [
        "Title",
        "",
        "other body line with quite enough words here",
    ]


def test_line_dedup_normalizes_case_and_whitespace(spark):
    rows = [
        (1, "The  Quick   Brown Fox Jumps"),
        (2, "the quick brown fox jumps"),
    ]
    out = {r["doc_id"]: r for r in text.line_dedup(_docs(spark, rows)).collect()}
    assert out[1]["n_kept"] == 1  # first occurrence survives verbatim
    assert out[1]["text_clean"] == "The  Quick   Brown Fox Jumps"
    assert out[2]["n_kept"] == 0
    assert out[2]["text_clean"] == ""


def test_line_dedup_within_document_duplicates_collapse(spark):
    body = "repeated body line with several words in it"
    rows = [(1, f"{body}\nmiddle line with plenty of distinct words\n{body}")]
    out = text.line_dedup(_docs(spark, rows)).collect()[0]
    assert out["n_lines"] == 3
    assert out["n_kept"] == 2
    assert out["text_clean"].splitlines() == [
        body,
        "middle line with plenty of distinct words",
    ]


def test_quality_funnel_attribution(spark):
    stops = "the be to of and that have with"
    good = (
        ("good document line full of plain words. " + stops + " end. ") * 3
    ).strip()
    # fails ONLY word_count: three clean punctuated lines (C4 page
    # passes), every other gopher ratio in range, but < 50 words total
    short_line = f"short text {stops} here."
    short = "\n".join([short_line] * 3)
    rows = [(1, good + "\n" + good + "\n" + good), (2, short)]
    funnel = {r["rule"]: r for r in text.quality_funnel(_docs(spark, rows)).collect()}
    assert set(funnel) == {r for r, _ in text.FUNNEL_RULES}
    assert funnel["word_count"]["n_fail"] == 1
    assert funnel["word_count"]["n_sole_fail"] == 1
    # funnel is monotone non-increasing over stages
    survivors = [
        r["n_survive"]
        for r in sorted(funnel.values(), key=lambda r: r["stage"])
    ]
    assert survivors == sorted(survivors, reverse=True)
    assert survivors[0] <= 2


def test_split_leakage_audit_grouped_policy_never_spans(spark):
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.col("id")).alias("text"),
    )
    # pair up consecutive docs: (0,1), (2,3), ... — 100 groups of 2
    clusters = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % 2).alias("cluster_id"),
    )
    out = dedup.split_leakage_audit(docs, clusters).collect()
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in out) == 200
    assert sum(r["n_docs_naive"] for r in out) == 200
    assert sum(r["n_groups"] for r in out) == 100
    # grouped policy: every cluster lands in exactly one split
    assigned = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(F.coalesce("cluster_id", "doc_id").alias("g"), "doc_id")
    )
    pct = F.conv(F.substring(F.md5(F.col("g").cast("string")), 1, 4), 16, 10).cast(
        "long"
    ) % 100
    spans = (
        assigned.select(
            "g",
            F.when(pct < 80, "train").when(pct < 90, "val").otherwise("test").alias(
                "s"
            ),
        )
        .groupBy("g")
        .agg(F.countDistinct("s").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert spans == 0
    # naive policy leaks on this corpus (some pair straddles a boundary)
    assert sum(r["n_leaky_groups"] for r in out) > 0


def test_dsir_weights_favor_target_like_docs(spark):
    # quality ∝ token count here: long plain docs are the target slice
    quality_body = "the quick brown fox jumps over the lazy dog again " * 20
    noise_body = "zxqv kjhg wwpo qqee rrty " * 4
    rows = [(i, quality_body) for i in range(8)] + [
        (100 + i, noise_body) for i in range(4)
    ]
    out = {r["doc_id"]: r for r in text.dsir_weights(_docs(spark, rows)).collect()}
    assert set(out) == {*range(8), *range(100, 104)}
    # target-profile docs must outscore the noise docs
    assert min(out[i]["log_weight_micro"] for i in range(8)) > max(
        out[100 + i]["log_weight_micro"] for i in range(4)
    )
    assert all(r["n_feats"] > 0 for r in out.values())


def test_dsir_weights_skips_docs_without_bigrams(spark):
    rows = [(1, "lonely"), (2, "two tokens make one bigram " * 30)]
    out = text.dsir_weights(_docs(spark, rows)).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_source_caps_keeps_best_per_source(spark):
    docs = spark.createDataFrame(
        [
            (i, "word " * (10 + i) + "sentence end.", "en", "src_a", 0)
            for i in range(5)
        ]
        + [(10, "single low quality doc.", "en", "src_b", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = text.source_caps(docs, cap=2)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src["src_a"]) == 2
    assert len(by_src["src_b"]) == 1
    # ranks are 1..cap and the kept docs are the highest-quality ones
    assert sorted(r["q_rank"] for r in by_src["src_a"]) == [1, 2]
    kept_a = {r["doc_id"] for r in by_src["src_a"]}
    assert kept_a == {3, 4}  # longest docs → highest quality score


def test_packing_efficiency_bounds(spark):
    docs = spark.createDataFrame(
        [(i, "tok " * 100) for i in range(40)], "doc_id long, text string"
    )
    row = text.packing_efficiency(docs, budget=256, shards=4).collect()[0]
    assert row["n_bins"] > 0
    assert 0.0 <= row["avg_fill_frac"] <= 1.0
    assert 0.0 <= row["overflow_bin_frac"] <= 1.0
    assert abs((1.0 - row["avg_fill_frac"]) - row["waste_frac"]) < 1e-9


def test_bigram_lm_scores_exact_micro_arithmetic(spark):
    rows = [(1, "a b a b a b"), (2, "a b c d e f")]
    out = {r["doc_id"]: r for r in text.bigram_lm_scores(_docs(spark, rows)).collect()}
    assert out[1]["n_bigrams"] == 5
    assert out[2]["n_bigrams"] == 5
    # repeated bigrams are more probable → lower NLL than all-new bigrams
    assert out[1]["total_nll_micro"] < out[2]["total_nll_micro"]
    for r in out.values():
        assert r["avg_nll_micro"] == r["total_nll_micro"] // r["n_bigrams"]
        assert r["total_nll_micro"] > 0


def test_ccnet_buckets_tercile_labels(spark):
    # three score groups: common words, mixed, rare words
    rows = (
        [(i, "common words common words common words") for i in range(6)]
        + [(10 + i, "common words rare" + str(i) + " thing") for i in range(6)]
        + [(20 + i, f"zzz{i} qqq{i} vvv{i} kkk{i}") for i in range(6)]
    )
    out = text.ccnet_buckets(_docs(spark, rows)).collect()
    buckets = {r["doc_id"]: r["bucket"] for r in out}
    assert set(buckets.values()) == {"head", "middle", "tail"}
    # fluent docs land in head, rare-token docs in tail
    assert all(buckets[i] == "head" for i in range(6))
    assert all(buckets[20 + i] == "tail" for i in range(6))
    # value-based boundaries: equal scores share a bucket
    scores = {}
    for r in out:
        scores.setdefault(r["avg_neg_log2p"], set()).add(r["bucket"])
    assert all(len(b) == 1 for b in scores.values())


def test_oov_rate_against_top_vocab(spark):
    rows = [(1, "common common common"), (2, "common rareword")]
    out = {r["doc_id"]: r for r in text.oov_rate(_docs(spark, rows), vocab_size=1).collect()}
    assert out[1]["n_oov"] == 0 and out[1]["oov_rate"] == 0.0
    assert out[2]["n_oov"] == 1 and abs(out[2]["oov_rate"] - 0.5) < 1e-9


def test_c4_clean_drops_bad_lines_and_pages(spark):
    good_line = "this sentence has plenty of words and ends properly."
    rows = [
        (1, f"{good_line}\nshort line\n{good_line}\n{good_line}"),
        (2, f"{good_line}\n{good_line}"),          # only 2 kept -> page dropped
        (3, f"{good_line}\n{good_line}\n{good_line}\nlorem ipsum filler."),
        (4, "{ code block }\n" + "\n".join([good_line] * 3)),
    ]
    out = {r["doc_id"]: r for r in text.c4_clean(_docs(spark, rows)).collect()}
    assert set(out) == {1}
    assert out[1]["n_kept_lines"] == 3
    assert out[1]["text_clean"] == "\n".join([good_line] * 3)


def test_decontaminated_corpus_drops_overlapping_docs(spark):
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(1, eval_text, "en", "eval", 0),
         (20, eval_text + " extra words here", "en", "web", 0),
         (21, "totally unrelated content words nothing shared apple", "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = dedup.decontaminated_corpus(docs, eval_max_id=10, min_shared=2)
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {21}


def test_dedup_threshold_curve_monotone(spark):
    base = "one two three four five six seven eight nine ten"
    rows = [(1, base), (2, base), (3, base + " eleven"), (4, "unrelated words entirely different content")]
    curve = {r["threshold"]: r for r in dedup.dedup_threshold_curve(_docs(spark, rows)).collect()}
    ts = sorted(curve)
    pairs = [curve[t]["n_pairs"] for t in ts]
    docs_ = [curve[t]["n_docs"] for t in ts]
    assert pairs == sorted(pairs, reverse=True)
    assert docs_ == sorted(docs_, reverse=True)
    assert curve[ts[-1]]["n_pairs"] >= 1  # exact dup pair survives at 0.9


def test_corpus_funnel_stage_semantics(spark):
    from data_pipeline_example_spark import curation

    base = "plain words for the shared body of this document right here"
    # 20: distinct line but shares shingles with eval doc 1 → falls at
    #     decontamination. 30: its only line duplicates doc 1's → falls
    #     at unique_lines. 21/22: exact dups whose unique surviving
    #     line is the SHORT one (< 4 words, never a dedup key) → 22
    #     reaches and falls at exact_keeper. 23: clean solo.
    # distinct per-doc sources → no URL-canonical collisions, so the
    # url stage passes everything through and the text-stage semantics
    # stay exactly as designed
    docs = spark.createDataFrame(
        [
            (1, base, "sA"),                   # eval doc (id < 10)
            (20, base + " and a few extra trailing words too", "sB"),
            (30, base, "sC"),
            (21, "w1 w2 w3\nfive plain words are here", "sD"),
            (22, "w1 w2 w3\nfive plain words are here", "sE"),
            (23, "solo words entirely distinct from anything else around", "sF"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["rule"]: r["n_surviving"] for r in curation.corpus_funnel(docs).collect()}
    assert out["raw"] == 6
    # funnel is monotone non-increasing in stage order
    order = ["raw", "url_canonical", "c4_page", "unique_lines",
             "exact_keeper", "decontaminated", "gopher"]
    vals = [out[r] for r in order]
    assert vals == sorted(vals, reverse=True)
    assert out["url_canonical"] == 6   # distinct hosts: nothing collides
    assert out["unique_lines"] == 5    # 30 falls (its one line is a dup)
    assert out["exact_keeper"] == 4    # 22 falls (exact dup of 21)
    assert out["decontaminated"] == 3  # 20 falls (shingle overlap w/ eval)
    assert out["gopher"] == 0          # word-count rule fails the fixtures

    # same corpus under ONE source: doc_id%8 collisions (30↔22) make the
    # url stage itself bite — 30 falls there as the larger id of its
    # canonical group, before any text stage sees it
    docs_one_src = docs.drop("source")
    out1 = {r["rule"]: r["n_surviving"]
            for r in curation.corpus_funnel(docs_one_src).collect()}
    assert out1["raw"] == 6
    assert out1["url_canonical"] == 5  # 30 falls (/doc/6 dup of 22)


def test_skew_report_heavy_hitters(spark):
    from data_pipeline_example_spark.operators import users

    rows = [(i, 1 if i < 90 else i) for i in range(100)]  # key 1 holds 90%
    events = spark.createDataFrame(rows, "event_id long, user_id long")
    out = users.skew_report(events, top=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    top = out[0]
    assert top["key_value"] == "1" and top["n_rows"] == 90
    assert abs(top["share_pct"] - 90.0) < 1e-9
    # 11 distinct keys, mean ~9.09 rows -> skew factor ~9.9
    assert abs(top["skew_factor"] - round(90 * 11 / 100.0, 4)) < 1e-9


def test_cluster_balance_audit_consistency(spark):
    from data_pipeline_example_spark.operators import similarity

    vecs = spark.createDataFrame(
        [(i, [float(i % 4), 1.0, float((i * 7) % 5)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    row = similarity.cluster_balance_audit(vecs, n_centroids=4).collect()[0]
    assert row["n_vecs"] == 40
    assert 1 <= row["n_buckets"] <= 4
    assert row["min_bucket"] <= row["avg_bucket"] <= row["max_bucket"]
    assert abs(row["balance_factor"] - round(row["max_bucket"] / (40 / row["n_buckets"]), 4)) < 1e-6


def test_join_size_estimate_exact_regime(spark):
    from data_pipeline_example_spark.operators import users

    left = spark.createDataFrame([(i,) for i in range(30)], "o_custkey long")
    right = spark.createDataFrame([(i,) for i in range(20, 50)], "c_custkey long")
    row = users.join_size_estimate(left, "o_custkey", right, "c_custkey", k=64).collect()[0]
    # below the sketch size everything is exact
    assert row["est_left"] == 30 and row["est_right"] == 30
    assert row["est_union"] == 50
    assert row["est_intersection"] == 10
    assert row["n_exact_intersection"] == 10
    assert row["rel_err"] == 0.0


def test_branded_quantity_revenue_branch_tagging(spark):
    from data_pipeline_example_spark.operators import tpch

    part = spark.createDataFrame(
        [(1, "p", "Brand#12", "t", 5, 1.0), (2, "p", "Brand#23", "t", 20, 1.0),
         (3, "p", "Brand#99", "t", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    li = spark.createDataFrame(
        [(1, 1, 1, 1, 10.0, 100.0, 0.1), (2, 2, 1, 1, 25.0, 200.0, 0.0),
         (3, 3, 1, 1, 10.0, 300.0, 0.0),   # brand outside the disjuncts
         (4, 1, 1, 1, 40.0, 400.0, 0.0)],  # quantity outside branch 1's band
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double",
    )
    out = {r["branch"]: r for r in tpch.branded_quantity_revenue(li, part).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_items"] == 1 and abs(out[1]["revenue"] - 90.0) < 1e-9
    assert out[2]["n_items"] == 1 and abs(out[2]["revenue"] - 200.0) < 1e-9


def test_returned_item_ranking_orders_by_return_revenue(spark):
    from data_pipeline_example_spark.operators import tpch

    customer = spark.createDataFrame(
        [(1, "alice", 0, 0.0, "A"), (2, "bob", 0, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1), (11, 2)], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [(10, 100.0, 0.0, "R"), (10, 50.0, 0.0, "N"), (11, 300.0, 0.5, "R")],
        "l_orderkey long, l_extendedprice double, l_discount double, l_returnflag string",
    )
    rows = tpch.returned_item_ranking(customer, orders, li, top=10).collect()
    assert [(r["c_custkey"], r["revenue"]) for r in rows] == [(2, 150.0), (1, 100.0)]


def test_cross_modal_prune_counts(spark):
    from data_pipeline_example_spark import curation

    docs = spark.createDataFrame(
        [(0, "identical text body here", "en", "web", 0),
         (1, "identical text body here", "en", "web", 0),   # exact dup of 0
         (2, "completely different words", "en", "books", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # embeddings: 0 and 1 near-parallel (semantic dups), 2 orthogonal
    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 1e-4]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r["source"]: r for r in curation.cross_modal_prune(docs, vecs).collect()}
    web = out["web"]
    assert web["n_docs"] == 2
    assert web["n_text_dropped"] == 1     # doc 1 loses exact dedup
    assert web["n_sem_dropped"] >= 1      # doc 1 is also a semantic dup
    assert web["n_kept"] == 1
    assert out["books"]["n_kept"] == 1


def test_local_supplier_volume_same_nation_only(spark):
    from data_pipeline_example_spark.operators import tpch

    region = spark.createDataFrame([(0, "ASIA")], "r_regionkey long, r_name string")
    nation = spark.createDataFrame(
        [(0, "JAPAN", 0), (1, "INDIA", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    supplier = spark.createDataFrame(
        [(1, "s1", 0, 0.0)], "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
    )
    customer = spark.createDataFrame(
        [(1, "c-jp", 0, 0.0, "A"), (2, "c-in", 1, 0.0, "A")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "1996-06-01"), (11, 2, "1996-06-01")],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    li = spark.createDataFrame(
        [(10, 1, 100.0, 0.0), (11, 1, 999.0, 0.0)],
        "l_orderkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    rows = tpch.local_supplier_volume(
        customer, orders, li, supplier, nation, region
    ).collect()
    # only the same-nation (customer JP, supplier JP) order counts
    assert [(r["n_name"], r["revenue"]) for r in rows] == [("JAPAN", 100.0)]


def test_ccnet_mixture_rates_and_counts(spark):
    rows = (
        [(i, "common words common words common words") for i in range(6)]
        + [(10 + i, "common words rare" + str(i) + " thing") for i in range(6)]
        + [(20 + i, f"zzz{i} qqq{i} vvv{i} kkk{i}") for i in range(6)]
    )
    out = {r["bucket"]: r for r in text.ccnet_mixture(_docs(spark, rows)).collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert out["head"]["rate"] == 1.0
    assert out["head"]["n_sampled"] == out["head"]["n_docs"]  # rate 1.0 keeps all
    for b in out.values():
        assert 0 <= b["n_sampled"] <= b["n_docs"]


def test_corpus_funnel_matches_member_composition(spark, sf_dir):
    """The single-scan rewrite must produce exactly the funnel the
    standalone member operators compose to — flag semantics pinned on
    the real sf corpus (covers empty docs, heavy line duplication,
    exact-dup classes, eval-shingle overlap)."""
    from data_pipeline_example_spark import curation
    from data_pipeline_example_spark.operators import text as tx

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # member composition (the pre-single-scan formulation)
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    from data_pipeline_example_spark.operators import urls as urls_ops

    uk = {r["doc_id"] for r in urls_ops.url_canonical_dedup(docs)
          .filter(F.col("is_keeper") == 1).select("doc_id").collect()}
    c4 = {r["doc_id"] for r in tx.c4_clean(
        docs, require_terminal=False, min_kept_lines=1).select("doc_id").collect()}
    uni = {r["doc_id"] for r in tx.line_dedup(docs)
           .filter(F.col("n_kept") > 0).select("doc_id").collect()}
    keep = {r["keep_doc_id"] for r in dedup.exact_dedup(docs).collect()}
    gq = {r["doc_id"] for r in tx.gopher_quality(docs)
          .filter(F.col("passes") == 1).collect()}
    cont = {r["doc_id"] for r in dedup.contamination_pairs(docs)
            .filter(F.col("n_shared") >= 2).select("doc_id").distinct().collect()}
    sets = [set(ids), uk, c4, uni, keep, set(ids) - cont, gq]
    want, cum = [], set(ids)
    for s in sets:
        cum &= s
        want.append(len(cum))
    got = {r["stage"]: r["n_surviving"]
           for r in curation.corpus_funnel(docs).collect()}
    assert [got[i] for i in range(1, 8)] == want


def test_substring_dedup_exactsubstr_semantics(spark):
    """ExactSubstr: a k-token span surviving at its FIRST (doc_id, pos)
    occurrence and removed everywhere later, independent of line
    structure; whole-span docs empty out; span-free docs untouched."""
    from data_pipeline_example_spark.operators import text as tx

    span = " ".join(f"w{i}" for i in range(6))
    docs = spark.createDataFrame(
        [
            (1, "unique lead " + span + " unique tail one"),
            (2, "other opening words " + span + " different ending entirely"),
            (3, span),
            (4, "no duplication in this document at all"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.substring_dedup(docs, k=6).collect()}
    assert out[1]["n_dropped"] == 0 and span in out[1]["text_clean"]
    assert out[2]["n_dropped"] == 6 and span not in out[2]["text_clean"]
    assert out[2]["text_clean"] == "other opening words different ending entirely"
    assert out[3]["n_dropped"] == 6 and out[3]["text_clean"] == ""
    assert out[4]["n_dropped"] == 0
    assert out[5]["n_tokens"] == 0 and out[5]["text_clean"] == ""
    # overlapping duplicated spans merge: doc repeating a 7-token run
    # has two overlapping duplicated 6-grams; all 7 tokens drop
    run = " ".join(f"v{i}" for i in range(7))
    docs2 = spark.createDataFrame(
        [(1, run + " filler"), (2, "pre " + run + " post")],
        "doc_id long, text string",
    )
    out2 = {r["doc_id"]: r for r in tx.substring_dedup(docs2, k=6).collect()}
    assert out2[2]["n_dropped"] == 7 and out2[2]["text_clean"] == "pre post"
