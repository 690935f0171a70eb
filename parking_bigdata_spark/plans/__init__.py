"""Physical-plan audit helpers (the `plans/` layer of the module map):
extract the scale-relevant properties of an executed plan — shuffle
count, broadcast joins, pushed filters, read schema, Python-UDF
presence — so tests and reports assert on structure, not substrings
scattered per call site.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    shuffles: int = 0
    broadcast_hash_joins: int = 0
    broadcast_nl_joins: int = 0
    sort_merge_joins: int = 0
    single_partition_exchanges: int = 0
    file_scans: int = 0
    python_evals: int = 0          # row-at-a-time Python UDFs (slow path)
    arrow_evals: int = 0           # pandas UDFs (sanctioned Python)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    text: str = ""


def audit(df: DataFrame) -> PlanAudit:
    """Audit the executed (pre-AQE-finalized) physical plan of ``df``."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return PlanAudit(
        # anchored regex, not substring count: BroadcastExchange contains
        # "Exchange", and a ReusedExchange node prints as
        # "ReusedExchange [attrs], Exchange hashpartitioning(...)" — the
        # embedded mention is preceded by ", ", so exclude that context
        # too (ADVICE r01 + code-review r02, verified on Spark 4.1.2)
        shuffles=len(re.findall(
            r"(?<!Broadcast)(?<!Reused)(?<!, )"
            r"Exchange (?:hash|range|RoundRobin|SinglePartition)",
            plan)),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        broadcast_nl_joins=plan.count("BroadcastNestedLoopJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        single_partition_exchanges=plan.count("Exchange SinglePartition"),
        file_scans=plan.count("FileScan"),
        python_evals=plan.count("BatchEvalPython"),
        arrow_evals=plan.count("ArrowEvalPython"),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)", plan),
        read_schemas=re.findall(r"ReadSchema: (\S+)", plan),
        text=plan,
    )
