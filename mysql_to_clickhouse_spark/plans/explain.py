"""Plan-inspection helpers: assert that the physical plan is the one a
100 TB deployment needs (pushdown reached the scan, dims broadcast,
codegen active) instead of hoping.

Used by tests/test_plans.py; also handy interactively:
    from mysql_to_clickhouse_spark.plans.explain import plan_of
    print(plan_of(df))
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def has_pushed_filters(df: DataFrame) -> bool:
    """True if the parquet scan received at least one pushed filter."""
    plan = plan_of(df)
    for line in plan.splitlines():
        if "PushedFilters:" in line and "PushedFilters: []" not in line:
            return True
    return False


def scan_read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema of every scan — column pruning made visible."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan_of(df).splitlines()
        if "ReadSchema:" in line
    ]


def num_broadcast_joins(df: DataFrame) -> int:
    return plan_of(df, "simple").count("BroadcastHashJoin")


def num_shuffles(df: DataFrame) -> int:
    """SHUFFLE exchanges in the plan (AQE may later coalesce them).

    BroadcastExchange is excluded: it ships a bounded build side to
    every executor, not a repartition of the data — counting it as a
    shuffle would penalize exactly the plans we want (broadcast joins
    replacing shuffle joins)."""
    plan = plan_of(df, "simple")
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def has_codegen(df: DataFrame) -> bool:
    # AQE-wrapped plans don't print WholeStageCodegen nodes in simple
    # mode; formatted mode annotates operators with [codegen id : N]
    plan = plan_of(df, "formatted")
    return "codegen id" in plan or "WholeStageCodegen" in plan


def global_window_nodes(df: DataFrame) -> list[str]:
    """Class names of logical Window / WindowGroupLimit nodes with an
    EMPTY partitionSpec in the optimized plan — each one plans a
    physical WindowExec that funnels every row into a single task, the
    global-sort scale-killer the two-phase prefix scan
    (plans/prefix.py) exists to avoid. Detection walks the plan's JSON
    tree, not the plan string (partition specs aren't reliably
    printable)."""
    import json

    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    return [
        node["class"].rsplit(".", 1)[-1]
        for node in nodes
        if (
            node.get("class", "").endswith(".Window")
            or node.get("class", "").endswith(".WindowGroupLimit")
        )
        and not node.get("partitionSpec")
    ]
