"""Physical-plan auditing: assert the optimizer produced the plan we want.

Correctness tests prove the right ANSWER; these helpers prove the right
PLAN — pushdown reached the scan, dims broadcast, top-k avoided a global
sort. At 100 TB a silent plan regression (a filter that stops pushing, a
broadcast that falls back to shuffle) is a production incident; the plan
tests in ``tests/test_plan_shapes.py`` pin the shapes.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanFeatures:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    join_nodes: list[str] = field(default_factory=list)
    has_take_ordered: bool = False
    has_generate: bool = False
    n_exchanges: int = 0
    raw: str = ""


def plan_features(df: DataFrame) -> PlanFeatures:
    """Extract scale-relevant features from the executed (pre-run) plan."""
    raw = df._jdf.queryExecution().executedPlan().toString()
    return PlanFeatures(
        pushed_filters=[
            m.group(1)
            for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", raw)
            if m.group(1)
        ],
        read_schemas=re.findall(r"ReadSchema: (\S+)", raw),
        join_nodes=re.findall(r"(\w+Join)\b", raw),
        has_take_ordered="TakeOrderedAndProject" in raw,
        has_generate="Generate" in raw,
        n_exchanges=raw.count("Exchange "),
        raw=raw,
    )


def scan_partition_reads(df: DataFrame) -> list[dict[str, int]]:
    """Runtime scan metrics per file-scan node, AFTER the df has executed.

    Walks the executed plan through AQE's QueryStage wrappers (whose
    ``children()`` is empty — the real subtree hangs off ``plan()`` /
    ``executedPlan()``) and returns each parquet scan's metric map. The
    ``numPartitions`` entry is the number of partition DIRECTORIES the
    scan actually listed after static + dynamic pruning — the execution
    proof behind the DPP plan pin (a dynamicpruningexpression that never
    pruned would still show all partitions here).
    """
    out: list[dict[str, int]] = []

    def walk(node) -> None:
        name = node.nodeName()
        if "Scan" in name:
            metrics: dict[str, int] = {}
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                metrics[kv._1()] = kv._2().value()
            out.append(metrics)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
        elif "QueryStage" in name:
            walk(node.plan())

    walk(df._jdf.queryExecution().executedPlan())
    return out
