"""Plan-shape assertions over the whole query registry: the properties
the engine's 100 TB design notes promise (README) should be visible in
every optimized plan, not just in docstrings.

* no unbroadcast cartesian products (BroadcastNestedLoopJoin over a
  broadcast side is fine — that's the intended crossJoin(broadcast(q))
  shape; CartesianProduct means an accidental n×m shuffle explosion)
* no row-at-a-time Python UDFs (BatchEvalPython); the only Python
  boundaries are Arrow-batched (ArrowEvalPython / FlatMapGroupsInPandas
  / MapInPandas)
* every UNPARTITIONED Window (the `WindowExec: No Partition Defined`
  single-partition shape) sits above an aggregate — the tiny-frame
  discipline the docstrings promise (token_gini's rank window runs
  over ≤|sources| rows, never over the corpus), made mechanical
* filtered parquet scans actually push their filters (spot-check)
"""

from __future__ import annotations

import re

import pytest

from data_pipeline_example_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"

_BOUNDED_BELOW = (
    "HashAggregate",        # incl. ObjectHashAggregate / SortAggregate
    "SortAggregate",
    "LocalTableScan",       # literal planning frames (histogram cuts)
    "TakeOrderedAndProject",  # global top-n: parameter-bounded rows
    "GlobalLimit",            # .limit(n) frames (every n is a parameter)
)


def _executed_plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _top_level_lists(args: str) -> list[str]:
    """Top-level ``[...]`` lists in a formatted-plan Arguments line.
    A physical Window prints [functions], then the partition spec and
    order spec lists — each omitted when empty."""
    out, depth, start = [], 0, -1
    for i, ch in enumerate(args):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append(args[start:i])
    return out


def _window_is_unpartitioned(args: str) -> bool:
    """3 lists = partitioned+ordered; 2 lists = EITHER unpartitioned+
    ordered (second list is a sort spec — carries ASC/DESC) OR
    partitioned+unordered (plain column list); 1 list = neither spec,
    i.e. a global frame."""
    lists = _top_level_lists(args)
    if len(lists) >= 3 or not lists:
        return False
    if len(lists) == 1:
        return True
    return " ASC" in lists[1] or " DESC" in lists[1]


def _unbounded_single_partition_windows(plan: str) -> list[str]:
    """Node ids of unpartitioned Windows with NO aggregate (or literal
    frame) anywhere beneath them — the shape where the executor that
    hosts the single partition receives unbounded input."""
    tree, _, details = plan.partition("\n\n")
    args = dict(
        re.findall(r"\((\d+)\) Window\b[^\n]*\n(?:[^\n]*\n)*?Arguments: ([^\n]*)", details)
    )
    lines = tree.split("\n")
    offenders = []
    for i, line in enumerate(lines):
        m = re.search(r"(\s*)(?:[:+\-* ]*)Window(?:\w*)? \((\d+)\)", line)
        if not m:
            continue
        node_id = m.group(2)
        if node_id not in args or not _window_is_unpartitioned(args[node_id]):
            continue
        indent = len(line) - len(line.lstrip(" :+-*"))
        subtree = []
        for nxt in lines[i + 1 :]:
            if len(nxt) - len(nxt.lstrip(" :+-*")) <= indent:
                break
            subtree.append(nxt)
        if not any(b in s for s in subtree for b in _BOUNDED_BELOW):
            offenders.append(node_id)
    return offenders


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_no_row_udf_no_unbounded_global_window(spark, name):
    plan = _executed_plan(QUERIES[name](spark, SF))
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, f"{name} uses a row-at-a-time Python UDF"
    bad = _unbounded_single_partition_windows(plan)
    assert not bad, (
        f"{name} plans unpartitioned Window node(s) {bad} with no "
        "aggregate beneath — single-partition window over unbounded input"
    )


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
