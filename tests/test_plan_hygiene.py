"""Plan-shape assertions over the whole query registry: the properties
the engine's 100 TB design notes promise (README) should be visible in
every optimized plan, not just in docstrings.

* no unbroadcast cartesian products (BroadcastNestedLoopJoin over a
  broadcast side is fine — that's the intended crossJoin(broadcast(q))
  shape; CartesianProduct means an accidental n×m shuffle explosion)
* no row-at-a-time Python UDFs (BatchEvalPython); the only Python
  boundaries are Arrow-batched (ArrowEvalPython / FlatMapGroupsInPandas
  / MapInPandas)
* filtered parquet scans actually push their filters (spot-check)
"""

from __future__ import annotations

import pytest

from data_pipeline_example_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_and_no_row_udf(spark, name):
    plan = _executed_plan(QUERIES[name](spark, SF))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"


def test_filter_pushdown_reaches_scan(spark):
    plan = _executed_plan(QUERIES["top_revenue_orders"](spark, SF))
    assert "PushedFilters" in plan
    assert "o_orderdate" in plan.split("PushedFilters", 1)[1][:400]


def test_forecast_revenue_pushes_all_range_filters(spark):
    plan = _executed_plan(QUERIES["forecast_revenue"](spark, SF))
    pushed = plan.split("PushedFilters", 1)[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to the lineitem scan"


def test_market_share_broadcasts_bounded_dims_only(spark):
    plan = _executed_plan(QUERIES["market_share"](spark, SF))
    # bounded dims (part, supplier+nation, nation+region) broadcast;
    # since the r6 sweep the CUSTOMER-derived side is deliberately
    # unhinted (it scales with the fact table — forced broadcast is the
    # driver-OOM anti-pattern), so the static plan may carry up to two
    # SortMergeJoins: lineitem⋈orders and orders⋈customer (AQE converts
    # the latter to broadcast at runtime when the filtered side is
    # small)
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") <= 2


def test_asof_join_single_shuffle_no_pairs_blowup(spark):
    plan = _executed_plan(QUERIES["asof_last_view"](spark, SF))
    # union trick: a window over (user_id, ts) — never a range join
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 2
