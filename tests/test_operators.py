"""Golden-value tests for retail/window/text/multimodal operators on
small crafted inputs (SURVEY.md §5 items 1 and 3)."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from data_pipeline_example_spark.operators import multimodal, retail, text, tpch, windows


@pytest.fixture(scope="module")
def clean(spark):
    d = datetime.date
    rows = [
        (1, d(2025, 1, 1), "dosa", 10.0),
        (2, d(2025, 1, 1), "dosa", 5.5),
        (3, d(2025, 1, 1), "idli", 2.0),
        (4, d(2025, 1, 2), "dosa", 1.0),
    ]
    return spark.createDataFrame(rows, ["event_id", "order_date", "product", "amount"])


def test_daily_revenue_golden(clean):
    got = {(str(r["order_date"]), r["product"]): r["total_amount"]
           for r in retail.daily_revenue(clean).collect()}
    assert got == {
        ("2025-01-01", "dosa"): 15.5,
        ("2025-01-01", "idli"): 2.0,
        ("2025-01-02", "dosa"): 1.0,
    }


def test_kpis_single_pass(clean):
    row = retail.kpis(clean).collect()[0]
    assert row["grand_total"] == 18.5
    assert row["distinct_products"] == 2
    assert row["rows"] == 4


def test_top_products_deterministic_ties(spark):
    d = datetime.date
    daily = spark.createDataFrame(
        [(d(2025, 1, 1), "b", 5.0), (d(2025, 1, 1), "a", 5.0), (d(2025, 1, 1), "c", 9.0)],
        ["order_date", "product", "total_amount"],
    )
    got = [r["product"] for r in retail.top_products(daily, n=2).collect()]
    assert got == ["c", "a"]  # tie at 5.0 broken alphabetically


def test_sliding_window_expansion(spark):
    ts = datetime.datetime
    df = spark.createDataFrame(
        [(ts(2025, 1, 1, 10, 0, 0), "p", 4.0)], ["order_ts", "product", "amount"]
    )
    out = windows.sliding_window_agg(df).collect()
    starts = sorted(r["window_start"] for r in out)
    assert starts == [
        ts(2025, 1, 1, 9, 15),
        ts(2025, 1, 1, 9, 30),
        ts(2025, 1, 1, 9, 45),
        ts(2025, 1, 1, 10, 0),
    ]
    assert all(r["window_end"] - r["window_start"] == datetime.timedelta(hours=1) for r in out)
    assert all(r["revenue"] == 4.0 for r in out)


def test_latest_window_leaderboard(spark):
    ts = datetime.datetime
    w = spark.createDataFrame(
        [
            (ts(2025, 1, 1, 9, 0), ts(2025, 1, 1, 10, 0), "a", 1.0),
            (ts(2025, 1, 1, 9, 15), ts(2025, 1, 1, 10, 15), "a", 2.0),
            (ts(2025, 1, 1, 9, 15), ts(2025, 1, 1, 10, 15), "b", 7.0),
        ],
        ["window_start", "window_end", "product", "revenue"],
    )
    got = [(r["product"], r["revenue"]) for r in windows.latest_window_leaderboard(w).collect()]
    assert got == [("b", 7.0), ("a", 2.0)]  # only the 10:15 window


def test_text_stats_and_lang(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat and the dog, in it!", "en", "s", 27),
            (1, "der hund und die katze ist nicht da", "de", "s", 35),
            (2, "", "en", "s", 0),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    stats = {r["doc_id"]: r for r in text.doc_stats(docs).collect()}
    assert stats[0]["n_tokens"] == 7
    assert stats[0]["punct_ratio"] == round(2 / 27, 4)
    assert stats[2]["n_tokens"] == 0 and stats[2]["quality"] == 0.0
    preds = {r["doc_id"]: r["lang_pred"] for r in text.lang_predict(docs).collect()}
    assert preds[0] == "en"
    assert preds[1] == "de"
    assert preds[2] == "und"


def test_fingerprint_normalizes_whitespace_and_case(spark):
    docs = spark.createDataFrame(
        [(0, "Hello   World", "en", "s", 13), (1, "  hello world ", "en", "s", 14)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    fps = [r["fingerprint"] for r in text.doc_stats(docs).collect()]
    assert fps[0] == fps[1]


def test_multimodal_features_roundtrip(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(0, "abc", "en", "s", 3), (1, "", "en", "s", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    got = {r["doc_id"]: r for r in multimodal.media_features(docs).collect()}
    assert got[0]["n_bytes"] == 3
    assert got[0]["content_md5"] == hashlib.md5(b"abc").hexdigest()
    # text payloads are not images: typed reject, not a fake decode
    assert got[0]["width"] is None and got[0]["height"] is None
    assert got[0]["decodable"] == 0
    assert got[1]["n_bytes"] == 0


def test_extract_features_decodes_real_image_payloads(spark):
    """The decode-attempt path: a valid P6 payload among opaque text
    payloads gets REAL width/height (stdlib or PIL decoder), the rest
    get the typed reject."""
    img = multimodal.encode_netpbm(
        multimodal.StdlibImage(2, 3, "RGB", b"A" * 18, "PPM")
    )
    media = spark.createDataFrame(
        [(0, "image/x-portable-pixmap", bytearray(img)),
         (1, "text/plain", bytearray(b"not an image"))],
        multimodal.MEDIA_SCHEMA,
    )
    got = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    assert (got[0]["width"], got[0]["height"], got[0]["decodable"]) == (2, 3, 1)
    assert (got[1]["width"], got[1]["decodable"]) == (None, 0)


def test_decode_image_is_marked_stub():
    import pytest as _pytest

    # a truncated magic (not the full 8-byte PNG signature) never
    # reaches a decoder: whitelist reject, environment-invariant
    with _pytest.raises(ValueError, match="whitelist"):
        multimodal.decode_image(b"\x89PNG")
    # the full signature passes the whitelist; without PIL the
    # non-stdlib format is a loud NotImplementedError stub (with PIL
    # the decoder itself rejects the truncated body)
    try:
        import PIL  # noqa: F401
    except ImportError:
        with _pytest.raises(NotImplementedError):
            multimodal.decode_image(b"\x89PNG\r\n\x1a\n")


def test_rolling_fingerprint_order_sensitive(spark):
    from data_pipeline_example_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "beta alpha"), (2, "Alpha  BETA"), (3, None), (4, "")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["rolling_fp"] for r in text_ops.doc_fingerprints(df).collect()}
    assert out[0] != out[1]  # order matters (unlike the md5 fingerprint)
    assert out[0] == out[2]  # case/extra-whitespace insensitive
    assert out[3] == out[4] == 0  # null/empty → init value


def test_tpch_outer_semi_anti_shapes(spark):
    from data_pipeline_example_spark.operators import tpch

    customer = spark.createDataFrame(
        [(1, "a", 0, 10.0, "S1"), (2, "b", 0, 20.0, "S1"), (3, "c", 1, 30.0, "S2")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    orders = spark.createDataFrame(
        [(100, 1, "F", 5.0, "2001-07-01", "1-URGENT"),
         (101, 1, "O", 6.0, "2001-07-02", "1-URGENT"),
         (102, 2, "O", 7.0, "2000-01-01", "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    nation = spark.createDataFrame(
        [(0, "ALPHA", 0), (1, "BETA", 0)], ["n_nationkey", "n_name", "n_regionkey"]
    )

    dist = {r["c_count"]: r["custdist"] for r in
            tpch.customer_order_distribution(customer, orders).collect()}
    assert dist == {2: 1, 1: 1, 0: 1}  # cust 3 kept by the outer join

    lapsed = {r["c_mktsegment"]: r["customers"] for r in
              tpch.lapsed_customers(customer, orders, cutoff="2001-06-01").collect()}
    assert lapsed == {"S1": 1, "S2": 1}  # cust 2 (old order) + cust 3 (none)

    fulfilled = {r["n_name"]: r["customers"] for r in
                 tpch.fulfilled_customers_by_nation(customer, orders, nation).collect()}
    assert fulfilled == {"ALPHA": 1}  # only cust 1 has an 'F' order


def test_user_cardinality_approx_within_rsd(spark, sf_dir):
    from data_pipeline_example_spark.operators import users

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    for r in users.user_cardinality(events).collect():
        assert abs(r["users_approx"] - r["users_exact"]) <= max(3, 0.1 * r["users_exact"])


def test_high_value_churn_set_semantics(spark):
    from data_pipeline_example_spark.operators import users

    events = spark.createDataFrame(
        [
            # user 1: high first half only → churned
            (1, "2024-01-10 00:00:00", 1, "a", 2000.0),
            (2, "2024-01-20 00:00:00", 1, "a", 10.0),
            # user 2: high both halves → retained
            (3, "2024-01-10 00:00:00", 2, "a", 2000.0),
            (4, "2024-01-20 00:00:00", 2, "a", 2000.0),
            # user 3: never high
            (5, "2024-01-10 00:00:00", 3, "a", 10.0),
        ],
        ["event_id", "ts", "user_id", "event_type", "value"],
    ).withColumn("ts", F.to_timestamp("ts"))
    assert [r["user_id"] for r in users.high_value_churn(events).collect()] == [1]
    assert [r["user_id"] for r in users.high_value_retained(events).collect()] == [2]


def test_revenue_rollup_levels(spark):
    from data_pipeline_example_spark.operators import retail

    df = spark.createDataFrame(
        [("2024-01-01", "A", 1.0), ("2024-01-01", "B", 2.0), ("2024-01-02", "A", 4.0)],
        ["order_date", "product", "amount"],
    ).withColumn("order_date", F.to_date("order_date"))
    rows = {(str(r["order_date"]), r["product"]): r["total_amount"]
            for r in retail.revenue_rollup(df).collect()}
    assert rows[("2024-01-01", "A")] == 1.0
    assert rows[("2024-01-01", None)] == 3.0   # per-date subtotal
    assert rows[("None", None)] == 7.0 or rows.get((None, None)) == 7.0  # grand total


def test_forecast_revenue_filters(spark):
    d = datetime.datetime
    li = spark.createDataFrame(
        [
            # in window, eligible: 100 * 0.05 = 5.0
            (d(1997, 6, 1), 0.05, 10.0, 100.0),
            # discount out of band
            (d(1997, 6, 1), 0.09, 10.0, 100.0),
            # quantity too big
            (d(1997, 6, 1), 0.05, 30.0, 100.0),
            # shipped outside window
            (d(1998, 6, 1), 0.05, 10.0, 100.0),
        ],
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    row = tpch.forecast_revenue(li).collect()[0]
    assert row["promo_revenue"] == 5.0
    assert row["line_count"] == 1


def test_top_supplier_keeps_ties(spark):
    d = datetime.datetime
    li = spark.createDataFrame(
        [
            (d(1997, 2, 1), 1, 100.0, 0.0),
            (d(1997, 2, 1), 2, 60.0, 0.0),
            (d(1997, 2, 1), 2, 40.0, 0.0),
            (d(1997, 2, 1), 3, 10.0, 0.0),
        ],
        ["l_shipdate", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    supp = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], ["s_suppkey", "s_name"]
    )
    got = [(r["s_suppkey"], r["total_revenue"])
           for r in tpch.top_supplier(li, supp).collect()]
    assert got == [(1, 100.0), (2, 100.0)]


def test_sole_return_suppliers_exists_not_exists(spark):
    li = spark.createDataFrame(
        [
            # order 10: supplier 1 returned, supplier 2 not → blamed
            (10, 1, "R"), (10, 2, "N"),
            # order 20: suppliers 1 and 2 both returned → nobody blamed
            (20, 1, "R"), (20, 2, "R"),
            # order 30: single-supplier order → EXISTS fails, not counted
            (30, 1, "R"),
        ],
        ["l_orderkey", "l_suppkey", "l_returnflag"],
    )
    orders = spark.createDataFrame(
        [(10, "F"), (20, "F"), (30, "F")], ["o_orderkey", "o_orderstatus"]
    )
    supp = spark.createDataFrame(
        [(1, "s1", 0), (2, "s2", 0)], ["s_suppkey", "s_name", "s_nationkey"]
    )
    nat = spark.createDataFrame([(0, "NATION_4")], ["n_nationkey", "n_name"])
    got = {r["s_name"]: r["numwait"]
           for r in tpch.sole_return_suppliers(li, orders, supp, nat).collect()}
    assert got == {"s1": 1}


def test_idle_rich_customers_scalar_cut_and_anti_join(spark):
    cust = spark.createDataFrame(
        [(1, 0, 100.0), (2, 0, 900.0), (3, 1, 800.0), (4, 1, -50.0)],
        ["c_custkey", "c_nationkey", "c_acctbal"],
    )
    # avg positive balance = 600.00; customers 2 (urgent order) and 3 qualify
    orders = spark.createDataFrame(
        [(2, "1-URGENT"), (3, "5-LOW")], ["o_custkey", "o_orderpriority"]
    )
    got = {r["c_nationkey"]: (r["numcust"], r["totacctbal"])
           for r in tpch.idle_rich_customers(cust, orders).collect()}
    assert got == {1: (1, 800.0)}


def test_market_share_conditional_ratio(spark):
    d = datetime.datetime
    li = spark.createDataFrame(
        [(1, 1, 1, 100.0, 0.0), (1, 2, 1, 300.0, 0.0)],
        ["l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"],
    )
    orders = spark.createDataFrame(
        [(1, 1, d(1996, 5, 1))], ["o_orderkey", "o_custkey", "o_orderdate"]
    )
    cust = spark.createDataFrame([(1, 7)], ["c_custkey", "c_nationkey"])
    supp = spark.createDataFrame(
        [(1, 3), (2, 8)], ["s_suppkey", "s_nationkey"]
    )
    nat = spark.createDataFrame(
        [(3, "NATION_3", 0), (7, "NATION_7", 0), (8, "NATION_8", 0)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = spark.createDataFrame([(0, "EUROPE")], ["r_regionkey", "r_name"])
    part = spark.createDataFrame([(1, "PROMO")], ["p_partkey", "p_type"])
    got = tpch.market_share(li, orders, cust, supp, nat, reg, part).collect()
    assert [(r["o_year"], r["mkt_share"]) for r in got] == [(1996, 0.25)]


def test_asof_join_semantics(spark):
    from data_pipeline_example_spark.operators import asof

    d = datetime.datetime
    events = spark.createDataFrame(
        [
            # user 1: view at 10:00, purchase at 10:05 → matched
            (1, d(2024, 1, 1, 10, 0), 1, "view", 0.0, ""),
            (2, d(2024, 1, 1, 10, 5), 1, "purchase", 9.0, ""),
            # user 1: second purchase still sees the 10:00 view
            (3, d(2024, 1, 1, 11, 0), 1, "purchase", 9.0, ""),
            # user 2: purchase with NO prior view → nulls
            (4, d(2024, 1, 1, 9, 0), 2, "purchase", 9.0, ""),
            (5, d(2024, 1, 1, 9, 30), 2, "view", 0.0, ""),
            # user 3: view at the SAME instant as the purchase → visible
            # (<= semantics); two same-ts views tie-break to higher id
            (6, d(2024, 1, 1, 8, 0), 3, "view", 0.0, ""),
            (7, d(2024, 1, 1, 8, 0), 3, "view", 0.0, ""),
            (8, d(2024, 1, 1, 8, 0), 3, "purchase", 9.0, ""),
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    got = {r["purchase_id"]: (r["asof_view_id"], r["gap_s"])
           for r in asof.asof_join_events(events).collect()}
    assert got == {2: (1, 300), 3: (1, 3600), 4: (None, None), 8: (7, 0)}


def test_hash_split_is_deterministic_and_total(spark, sf_dir):
    from data_pipeline_example_spark.operators import users as users_ops
    from data_pipeline_example_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    rows = {r["split"]: r["n"] for r in users_ops.hash_split_summary(events).collect()}
    again = {r["split"]: r["n"] for r in users_ops.hash_split_summary(events).collect()}
    assert rows == again
    assert sum(rows.values()) == events.count()
    # roughly 80/10/10 at sf0.001 (600 events) — loose sanity bound
    assert rows["train"] > rows["val"] and rows["train"] > rows["test"]


def test_priority_pivot_columns_static(spark, sf_dir):
    from data_pipeline_example_spark.sources import load_table

    out = tpch.priority_revenue_pivot(load_table(spark, sf_dir, "orders"))
    assert out.columns == ["o_year"] + tpch.PRIORITIES


def test_rolling_7d_ages_out_by_calendar(spark):
    d = datetime.date
    daily = spark.createDataFrame(
        [
            (d(2024, 1, 1), "a", 10.0),
            (d(2024, 1, 5), "a", 5.0),
            (d(2024, 1, 8), "a", 1.0),   # Jan 1 is 7 days back → aged out
        ],
        ["order_date", "product", "total_amount"],
    )
    got = {str(r["order_date"]): r["rolling_7d"]
           for r in retail.rolling_revenue_7d(daily).collect()}
    assert got == {"2024-01-01": 10.0, "2024-01-05": 15.0, "2024-01-08": 6.0}


def test_returns_cube_levels(spark):
    li = spark.createDataFrame(
        [("R", "F", 2.0), ("R", "O", 3.0), ("N", "F", 5.0)],
        ["l_returnflag", "l_linestatus", "l_quantity"],
    )
    rows = {(r["l_returnflag"], r["l_linestatus"], r["grp"]): r["sum_qty"]
            for r in tpch.returns_cube(li).collect()}
    assert rows[("R", "F", 0)] == 2.0       # detail
    assert rows[("R", None, 1)] == 5.0      # marginal over linestatus
    assert rows[(None, "F", 2)] == 7.0      # marginal over returnflag
    assert rows[(None, None, 3)] == 10.0    # grand total


def test_first_last_order_value_unique_ordering(spark):
    d = datetime.datetime
    orders = spark.createDataFrame(
        [
            (3, 1, d(2024, 1, 2), 30.0),
            (1, 1, d(2024, 1, 1), 10.0),
            # same date as orderkey 1 → orderkey breaks the tie
            (2, 1, d(2024, 1, 1), 20.0),
        ],
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    r = tpch.first_last_order_value(orders).collect()[0]
    assert (r["first_price"], r["last_price"], r["n_orders"]) == (10.0, 30.0, 3)


def test_salted_totals_match_direct_groupby(spark, sf_dir):
    from data_pipeline_example_spark.operators import users as users_ops
    from data_pipeline_example_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    salted = {r["event_type"]: (r["total_value"], r["n_events"])
              for r in users_ops.salted_event_totals(events).collect()}
    direct = {r["event_type"]: (r["tv"], r["ne"]) for r in
              events.groupBy("event_type")
              .agg(F.round(F.sum("value"), 2).alias("tv"),
                   F.count("event_id").alias("ne")).collect()}
    assert salted == direct


def test_kpis_long_matches_wide(spark, sf_dir):
    from data_pipeline_example_spark.operators import retail
    from data_pipeline_example_spark.plans.queries import _events_retail

    df = _events_retail(spark, sf_dir)
    wide = retail.kpis(df).collect()[0]
    long = {r["metric"]: r["value"] for r in retail.kpis_long(df).collect()}
    assert long["grand_total"] == float(wide["grand_total"])
    assert long["distinct_products"] == float(wide["distinct_products"])
    assert long["rows"] == float(wide["rows"])


def test_props_variant_stats_agrees_with_json_path_twin(spark, sf_dir):
    from data_pipeline_example_spark.operators import users
    from data_pipeline_example_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    variant = {r["k_decile"]: r for r in users.props_variant_stats(ev).collect()}
    classic = {r["k_decile"]: r for r in users.props_key_stats(ev).collect()}
    assert set(variant) == set(classic)  # same deciles either parse path
    for d, row in variant.items():
        assert row["n"] == classic[d]["n"]
        assert row["min_k"] <= classic[d]["avg_k"] <= row["max_k"]


def test_audio_windows_fanout_and_partial_tail(spark):
    from data_pipeline_example_spark.operators import multimodal as mm

    # 700 utf-8 bytes → 350 fake PCM16 samples; 10ms @ 16kHz = 160/window
    # → windows of 160, 160, 30 samples
    docs = spark.createDataFrame(
        [(1, "x" * 700, "en", "s", 700), (2, "", "en", "s", 0)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    rows = mm.audio_windows(mm.attach_binary(docs), window_ms=10).collect()
    mine = sorted([r for r in rows if r["doc_id"] == 1], key=lambda r: r["window_idx"])
    assert [r["n_samples"] for r in mine] == [160, 160, 30]
    assert [r["start_ms"] for r in mine] == [0, 10, 20]
    assert len({r["window_md5"] for r in mine}) == 3  # per-window digests differ
    assert not [r for r in rows if r["doc_id"] == 2]  # empty payload → no windows


def test_nation_actor_presence_full_outer_keeps_one_sided_nations(spark):
    from data_pipeline_example_spark.operators import tpch

    cust = spark.createDataFrame([(1, 10), (2, 10), (3, 20)], ["c_custkey", "c_nationkey"])
    supp = spark.createDataFrame([(1, 20), (2, 30)], ["s_suppkey", "s_nationkey"])
    nation = spark.createDataFrame(
        [(10, "ALPHA", 0), (20, "BETA", 0), (30, "GAMMA", 0)],
        ["n_nationkey", "n_name", "n_regionkey"],
    )
    rows = {r["n_name"]: r for r in tpch.nation_actor_presence(cust, supp, nation).collect()}
    assert rows["ALPHA"]["n_customers"] == 2 and rows["ALPHA"]["n_suppliers"] == 0
    assert rows["BETA"]["n_customers"] == 1 and rows["BETA"]["n_suppliers"] == 1
    assert rows["GAMMA"]["n_customers"] == 0 and rows["GAMMA"]["n_suppliers"] == 1
    assert rows["GAMMA"]["balance"] == -1  # supplier-only nation survives the join


def test_new_tpch_shapes_semantics(spark):
    """Q2/Q11/Q16/Q20-shaped ops on a hand-built micro-schema: argmin
    tie-break, integer HAVING threshold, anti-join exclusion, and the
    integer half-of-sum test."""
    from data_pipeline_example_spark.operators import tpch

    region = spark.createDataFrame(
        [(0, "EUROPE"), (1, "ASIA")], "r_regionkey long, r_name string"
    )
    nation = spark.createDataFrame(
        [(0, "NATION_7", 0), (1, "NATION_8", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    supplier = spark.createDataFrame(
        [(1, "S1", 0, 100.0), (2, "S2", 0, 200.0), (3, "S3", 1, -5.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    part = spark.createDataFrame(
        [(10, "red ring", "Brand#1", "SMALL", 5, 1.0),
         (11, "red bolt", "Brand#2", "SMALL", 9, 1.0),
         (12, "blue gear", "Brand#3", "PROMO", 5, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    li = spark.createDataFrame(
        [
            # part 10: S1 and S2 tie on min cost 5.0 → argmin picks S1
            (1, 10, 1, 1, 2.0, 5.0, 0.0, 0.0, "N", "O", "1996-03-01"),
            (2, 10, 2, 1, 2.0, 5.0, 0.0, 0.0, "N", "O", "1995-03-01"),
            # part 11: S2 cheaper; all its movement inside 1996 → Q20 hit
            (3, 11, 2, 1, 3.0, 4.0, 0.0, 0.0, "N", "O", "1996-05-01"),
            (4, 11, 1, 1, 1.0, 9.0, 0.0, 0.0, "N", "O", "1995-05-01"),
            # part 12 handled by S3 (excluded everywhere: bad standing,
            # PROMO type, non-EUROPE nation)
            (5, 12, 3, 1, 4.0, 7.0, 0.0, 0.0, "N", "O", "1996-06-01"),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))

    best = {r["p_partkey"]: r for r in tpch.min_cost_supplier(
        part, supplier, nation, region, li).collect()}
    assert best[10]["s_name"] == "S1" and best[10]["min_cost"] == 5.0  # tie → low key
    assert best[11]["s_name"] == "S2" and best[11]["min_cost"] == 4.0
    assert 12 not in best  # non-EUROPE supplier only

    # Q11: values are cents longs; bp threshold is integer-exact.
    # part 10: 2×(2*5.0) → 2000c; part 11: 3*4.0 + 1*9.0 → 2100c;
    # part 12 excluded (S3 is NATION_8). total = 4100c.
    stock_all = {r["l_partkey"]: r["value_cents"] for r in tpch.important_part_stock(
        li, supplier, nation, n_name="NATION_7", bp=0).collect()}
    assert stock_all == {10: 2000, 11: 2100}
    # bp=5000 → keep v > 50% of 4100c = 2050c → only part 11
    stock = {r["l_partkey"]: r["value_cents"] for r in tpch.important_part_stock(
        li, supplier, nation, n_name="NATION_7", bp=5000).collect()}
    assert stock == {11: 2100}

    cnt = {(r["p_brand"], r["p_size"]): r["supplier_cnt"]
           for r in tpch.supplier_count_by_part(li, part, supplier).collect()}
    assert cnt[("Brand#1", 5)] == 2 and cnt[("Brand#2", 9)] == 2
    assert ("Brand#3", 5) not in cnt  # PROMO excluded; S3 excluded anyway

    hits = [tuple(r) for r in tpch.excess_shipped_suppliers(
        li, part, supplier, nation).collect()]
    # S2 shipped 3 of its 3 red-part units in 1996 (2*3 > 3) via part 11,
    # and 2 of 4 for part 10 (2*2 > 4 false); S1's part-10 units were 1996
    # (2*2 > 2) → S1 hits via part 10; S3 only ships non-red
    assert ("S1", "NATION_7") in hits and ("S2", "NATION_7") in hits
    assert not [h for h in hits if h[0] == "S3"]


def test_vocab_nearest_typo_planted(spark):
    docs = spark.createDataFrame(
        [
            # "tabel" is a rare misspelling of "table" (distance 1);
            # "chair" has no neighbor within distance 2 → no row
            (1, "table table table tabel chair", "en", "s1", 10),
            (2, "table stable", "en", "s1", 10),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r["term"]: r for r in text.vocab_nearest_typo(docs).collect()}
    assert "chair" not in out  # nothing within distance 2
    # tabel's nearest is table (d=2, plain Levenshtein counts the
    # transposition as two edits; stable is d=3, out of range)
    assert out["tabel"]["neighbor"] == "table"
    assert out["tabel"]["distance"] == 2
    assert out["tabel"]["neighbor_count"] == 4
    # table's candidates: stable d=1 beats tabel d=2
    assert out["table"]["neighbor"] == "stable"
    assert out["table"]["distance"] == 1
    assert out["stable"]["neighbor"] == "table"  # d=1, count 4


def test_quality_quantile_normalize_per_source_fairness(spark):
    # source A: uniformly verbose stopword-rich docs; source B: terse.
    # A GLOBAL threshold would keep all of A and none of B; the
    # per-source rank keeps the top half of EACH.
    rows = []
    for i in range(4):
        rows.append((i, "the of to is " * (i + 1) + "xyz", "en", "A", 10))
    for i in range(4):
        rows.append((10 + i, "xyz " * (8 - i) + "the" * min(i, 1), "en", "B", 10))
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = {r["doc_id"]: r for r in text.quality_quantile_normalize(docs).collect()}
    for s in ("A", "B"):
        kept = [r for r in out.values() if r["source"] == s and r["keep"] == 1]
        assert len(kept) == 2, s  # top half of every source survives
    # rank_milli spans 0..1000 within each source
    a_ranks = sorted(r["rank_milli"] for r in out.values() if r["source"] == "A")
    assert a_ranks == [0, 333, 666, 1000]


def test_event_markov_transitions_planted(spark):
    from data_pipeline_example_spark.operators import users

    events = spark.createDataFrame(
        [
            # user 1: view -> cart -> buy ; user 2: view -> view
            (1, "2024-01-01 00:00:00", 1, "view", 1.0, None),
            (2, "2024-01-01 00:01:00", 1, "cart", 1.0, None),
            (3, "2024-01-01 00:02:00", 1, "buy", 1.0, None),
            (4, "2024-01-01 00:00:00", 2, "view", 1.0, None),
            (5, "2024-01-01 00:01:00", 2, "view", 1.0, None),
            # null user never contributes
            (6, "2024-01-01 00:03:00", None, "view", 1.0, None),
        ],
        "event_id int, ts string, user_id int, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["prev_event"], r["next_event"]): r
           for r in users.event_markov_transitions(events).collect()}
    assert out[("view", "cart")]["n_transitions"] == 1
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("cart", "buy")]["prob_milli"] == 1000
    assert out[("view", "cart")]["prob_milli"] == 500  # of view's 2 exits


def test_user_cardinality_hll_merge_and_accuracy(spark):
    from data_pipeline_example_spark.operators import users

    rows = [(i, "2024-01-01 00:00:00", i % 500, "t%d" % (i % 3), 1.0, None)
            for i in range(2000)]
    events = spark.createDataFrame(
        rows,
        "event_id int, ts string, user_id int, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["scope"]: r for r in users.user_cardinality_hll(events).collect()}
    # the merged '__all__' sketch must estimate the union, not the sum:
    # users overlap heavily across types, so the union estimate has to
    # sit near 500, far below the per-type total
    est_all = out["__all__"]["hll_estimate_milli"] / 1000.0
    assert out["__all__"]["n_exact"] == 500
    assert abs(est_all - 500) / 500 < 0.35  # m=64 → ~13% RSE; 35% is 2.7σ
    per_type_sum = sum(out[s]["hll_estimate_milli"] for s in out if s != "__all__")
    assert per_type_sum / 1000.0 > est_all * 1.5  # merge != sum


def test_user_cardinality_hll_p_bits_honored(spark):
    """p_bits must drive the bucket split, suffix width, alpha and
    estimate (the r12 advice found the split hard-coded to 6 bits, so
    any other p_bits silently mis-binned) — replay the register
    arithmetic in exact Python at p = 4, 6, 8 and require equality."""
    import hashlib

    from data_pipeline_example_spark.operators import users

    uids = list(range(300))
    rows = [(i, "2024-01-01 00:00:00", u, "t", 1.0, None)
            for i, u in enumerate(uids)]
    events = spark.createDataFrame(
        rows,
        "event_id int, ts string, user_id int, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))

    def expected(p_bits):
        m, w, alpha = users._hll_params(p_bits)
        regs = {}
        for u in set(uids):
            hv = int(hashlib.md5(str(u).encode()).hexdigest()[:9], 16)
            b, suf = hv >> w, hv % (1 << w)
            rho = (w + 1) if suf == 0 else (w + 1) - len(format(suf, "b"))
            regs[b] = max(regs.get(b, 0), rho)
        s = sum(1 << (w + 1 - r) for r in regs.values())
        s += (m - len(regs)) * (1 << (w + 1))
        return len(regs), alpha * m * m * (1 << (w + 1)) // s

    for p in (4, 6, 8):
        out = {r["scope"]: r
               for r in users.user_cardinality_hll(events, p_bits=p).collect()}
        hit, est = expected(p)
        assert out["t"]["n_buckets_hit"] == hit, p
        assert out["t"]["hll_estimate_milli"] == est, p
        # single type -> the merged sketch is identical
        assert out["__all__"]["hll_estimate_milli"] == est, p
    with pytest.raises(ValueError):
        users.user_cardinality_hll(events, p_bits=3)
    with pytest.raises(ValueError):
        users.user_cardinality_hll(events, p_bits=17)


def test_user_cardinality_hll_null_event_type_sentinel(spark):
    """NULL event_type coalesces to the 'unknown' scope BEFORE the
    rollup — the r12 advice found the NULL group colliding with the
    rollup's grand-total row, duplicating '__all__' and fanning out
    the estimate join."""
    from data_pipeline_example_spark.operators import users

    rows = [(1, "2024-01-01 00:00:00", 1, None, 1.0, None),
            (2, "2024-01-01 00:00:00", 2, "a", 1.0, None),
            (3, "2024-01-01 00:00:00", 3, "a", 1.0, None)]
    events = spark.createDataFrame(
        rows,
        "event_id int, ts string, user_id int, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = users.user_cardinality_hll(events).collect()
    scopes = [r["scope"] for r in out]
    assert len(scopes) == len(set(scopes)), "duplicate scope rows (join fan-out)"
    d = {r["scope"]: r for r in out}
    assert set(d) == {"__all__", "a", "unknown"}
    assert d["__all__"]["n_exact"] == 3
    assert d["a"]["n_exact"] == 2
    assert d["unknown"]["n_exact"] == 1


def test_copurchase_link_prediction_planted(spark):
    """Planted path graph: 1-2, 2-3 co-purchased (support 2 each) but
    1-3 never — the only predictable link, via common neighbor 2."""
    rows = []
    oid = 0
    for _ in range(2):  # support 2 for each edge
        for pair in [(1, 2), (2, 3)]:
            oid += 1
            rows += [(oid, pair[0]), (oid, pair[1])]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = tpch.copurchase_link_prediction(li).collect()
    assert [(r["part_a"], r["part_b"]) for r in out] == [(1, 3)]
    r = out[0]
    assert r["common_neighbors"] == 1
    # deg(1)=1 {2}, deg(3)=1 {2} -> jaccard = 1/(1+1-1) = 1000 milli
    assert r["jaccard_milli"] == 1000


def test_event_volume_changepoint_planted_shift(spark):
    from data_pipeline_example_spark.operators import users

    # 6 days: 10/day then a level shift to 30/day after day 3 —
    # |CUSUM| peaks exactly at the boundary day
    rows = []
    eid = 0
    for day in range(1, 7):
        n = 10 if day <= 3 else 30
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-0{day} 12:00:00", 1, "a", 1.0, None))
    events = spark.createDataFrame(
        rows,
        "event_id int, ts string, user_id int, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    r = users.event_volume_changepoint(events).collect()[0]
    assert str(r["split_day"]) == "2024-01-03"
    assert r["n_days"] == 6
    # mean 20/day -> dev scaled by D=6: three days at (10*6-120)=-60
    assert r["cusum_abs_max"] == 180
    assert r["mean_before_micro"] == 10_000_000
    assert r["mean_after_micro"] == 30_000_000


def test_k_anonymity_audit_planted(spark):
    customers = [(i, f"c{i}", i % 3, 0.0, "S%d" % (i % 2)) for i in range(20)]
    customers += [(100, "odd", 9, 0.0, "RARE")]  # singleton group
    df = spark.createDataFrame(
        customers,
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    out = tpch.k_anonymity_audit(df, k=5).collect()
    # nation = i%3, segment = i%2 over 0..19 -> sizes 4,3,3,4,3,3 + the
    # planted singleton; ordered by (size, nation, segment)
    assert [(r["c_nationkey"], r["c_mktsegment"], r["group_size"]) for r in out] == [
        (9, "RARE", 1),
        (0, "S1", 3),
        (1, "S0", 3),
        (2, "S0", 3),
        (2, "S1", 3),
        (0, "S0", 4),
        (1, "S1", 4),
    ]


def test_bootstrap_revenue_ci_brackets_point(spark, sf_dir):
    """The derandomized Poisson bootstrap: the CI band brackets the
    point estimate, the replicate mean sits near it (Poisson(1) has
    mean 1), and the whole row is run-to-run identical."""
    from data_pipeline_example_spark.operators import users

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    r1 = users.bootstrap_revenue_ci(events).collect()[0]
    r2 = users.bootstrap_revenue_ci(events).collect()[0]
    assert tuple(r1) == tuple(r2)  # fully deterministic
    assert r1["boot_lo_cents"] < r1["point_cents"] < r1["boot_hi_cents"]
    # replicate mean within ~5% of the point (w has mean 1, n is large)
    assert abs(r1["boot_mean_cents"] - r1["point_cents"]) < 0.05 * r1["point_cents"]


def test_basket_kcore_planted_convergence(spark):
    """A 4-clique (3-core) plus a pendant chain: peeling must drop the
    chain entirely — including the cascade (removing the leaf drops its
    parent next round) — and keep the clique at degree 3."""
    rows = []
    oid = 0
    # 4-clique over parts 1..4: every pair co-purchased twice
    import itertools
    for _ in range(2):
        for a, b in itertools.combinations([1, 2, 3, 4], 2):
            oid += 1
            rows += [(oid, a), (oid, b)]
        # chain 4-5-6 hanging off the clique (each edge support 2)
        for a, b in [(4, 5), (5, 6)]:
            oid += 1
            rows += [(oid, a), (oid, b)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {r["node"]: r["degree"] for r in tpch.basket_kcore(li).collect()}
    # node 6 (deg 1) peels in round 1; node 5 (deg 2 -> 1) cascades;
    # node 4 keeps its clique degree 3 after losing the chain edge
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_forecast_backtest_planted_series(spark):
    """Planted 14-month series: constant 100/month except month 13 at
    200. naive_1 evaluates 13 months; its only misses are the jump
    into and out of month 13. naive_12 evaluates 2 months: month 13
    (predicted 100, actual 200 -> ape 500000) and month 14 (predicted
    100, actual 100 -> 0)."""
    rows = []
    lid = 0
    for mo in range(14):
        y, m = 1995 + mo // 12, mo % 12 + 1
        amount = 200.0 if mo == 12 else 100.0
        lid += 1
        rows.append((lid, f"{y}-{m:02d}-15", amount))
    li = spark.createDataFrame(
        rows, ["l_orderkey", "l_shipdate", "l_extendedprice"]
    ).withColumn("l_shipdate", F.to_date("l_shipdate"))
    out = {r["method"]: r for r in tpch.forecast_backtest(li).collect()}
    assert out["naive_12"]["n_eval"] == 2
    # month 13: |200-100|*1e6 // 200 = 500000; month 14 is exact (its
    # lag-12 twin is the ordinary month 2) -> mean 250000
    assert out["naive_12"]["mape_micro"] == (500000 + 0) // 2
    assert out["naive_1"]["n_eval"] == 13
    # naive_1 misses only the jump INTO the spike (500000) and OUT of
    # it (|100-200|*1e6 // 100 = 1000000); 11 exact months
    assert out["naive_1"]["mape_micro"] == (500000 + 1000000) // 13
    # the spike inflates last-month error but leaves the seasonal
    # baseline's bias direction visible: naive_12 under-predicts it
    assert out["naive_12"]["bias_micro"] < 0


def test_loo_target_encoding_leakage_guard(spark):
    """The defining property: a row's encoding excludes its own value —
    planted: type 'a' rows at 100/200/300 get LOO means (250, 200,
    150); the singleton type 'b' falls back to the global LOO mean."""
    from data_pipeline_example_spark.operators import users

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "a", 1.0, None),
            (2, "2024-01-01 00:00:01", 1, "a", 2.0, None),
            (3, "2024-01-01 00:00:02", 1, "a", 3.0, None),
            (4, "2024-01-01 00:00:03", 1, "b", 9.0, None),
        ],
        "event_id int, ts string, user_id int, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["event_id"]: r["loo_mean_millicents"]
           for r in users.loo_target_encoding(events).collect()}
    assert out[1] == (200 + 300) * 1000 // 2   # excludes its own 100
    assert out[2] == (100 + 300) * 1000 // 2
    assert out[3] == (100 + 200) * 1000 // 2
    # singleton 'b': global LOO = (100+200+300)*1000 // 3
    assert out[4] == (100 + 200 + 300) * 1000 // 3


def test_event_trigrams_planted_paths(spark):
    from data_pipeline_example_spark.operators import users

    rows, eid = [], 0
    for u in range(3):  # three users repeat view->cart->buy
        for i, t in enumerate(["view", "cart", "buy"]):
            eid += 1
            rows.append((eid, f"2024-01-01 00:0{u}:{i:02d}", u, t, 1.0, None))
    # one user does a different path
    for i, t in enumerate(["view", "view", "exit"]):
        eid += 1
        rows.append((eid, f"2024-01-01 00:09:{i:02d}", 9, t, 1.0, None))
    events = spark.createDataFrame(
        rows,
        "event_id int, ts string, user_id int, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = [(r["e1"], r["e2"], r["e3"], r["n_paths"])
           for r in users.event_trigrams(events).collect()]
    assert out[0] == ("view", "cart", "buy", 3)
    assert ("view", "view", "exit", 1) in out
