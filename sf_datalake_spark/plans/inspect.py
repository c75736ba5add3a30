"""Physical-plan inspection: the feedback loop for scale tuning.

The engine's optimizer IS Catalyst (SURVEY.md §4 — zero custom rules
needed); what a 100 TB deployment needs instead is *visibility*: does
this plan push filters to parquet, prune columns, broadcast the small
side, stay inside whole-stage codegen, and shuffle only where required?
``plan_report`` extracts exactly those facts so tests (and humans) can
assert on them instead of eyeballing ``explain`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The ``explain("formatted")`` text (returned, not printed)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _final_plan(df: DataFrame) -> str:
    """Executed-plan string, AQE final section only (toString repeats
    the initial plan below it)."""
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def plan_report(df: DataFrame, execute: bool = False) -> dict:
    """Scale-relevant facts about a DataFrame's physical plan.

    With ``execute=True`` the plan is first run through the noop sink so
    AQE finalizes every query stage — codegen spans and runtime join
    choices only exist after execution (AdaptiveSparkPlan is a shell
    before it).

    Keys:
      n_exchanges          shuffle boundaries (hash/range repartitions)
      n_broadcasts         broadcast exchanges (small-dim joins)
      n_sort_merge_joins / n_hash_joins / n_nested_loop_joins
      n_python_evals       Batch/ArrowEvalPython + mapInPandas stages
      n_codegen_spans      whole-stage codegen regions (0 when not executed
                           under AQE — stages codegen at runtime)
      pushed_filters       parquet-level pushed predicates (per scan)
      read_schemas         column-pruned scan schemas (per scan)
    """
    if execute:
        # Must run THIS DataFrame's own queryExecution (a noop write would
        # clone the plan into a separate execution and leave this
        # AdaptiveSparkPlan unfinalized). Driver-side cost: full collect —
        # use on samples/aggregates, not raw 100 TB scans.
        df.collect()
    plan = _final_plan(df)
    formatted = explain_formatted(df)
    codegen = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen)
    n_codegen = int(m.group(1)) if m else 0
    if not n_codegen:
        n_codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    return {
        "n_exchanges": len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
        "n_broadcasts": plan.count("BroadcastExchange"),
        "n_sort_merge_joins": plan.count("SortMergeJoin"),
        "n_hash_joins": plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin"),
        "n_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "n_python_evals": (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
        ),
        "n_codegen_spans": n_codegen,
        "n_cartesian_products": plan.count("CartesianProduct"),
        "n_reused_exchanges": plan.count("ReusedExchange"),
        "n_scans": len(re.findall(r"Scan (?:parquet|orc|csv|ExistingRDD|json)", plan)),
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", formatted),
        "read_schemas": re.findall(r"ReadSchema: (struct<[^\n]*)", formatted),
        "plan": plan,
    }
