"""Physical-plan audits: assert the plan properties the 100 TB design
relies on (README "Design for 100 TB").

RAFT's performance work is kernel selection (SURVEY.md §4); ours is
plan shape. These helpers turn `.explain("formatted")` output into
checkable facts so tests can pin them:

- scan pruning:   ReadSchema carries only the needed columns
- filter pushdown: PushedFilters non-empty when a scan predicate exists
- broadcastability: small sides joined via BroadcastHashJoin
- codegen:        hot expressions inside WholeStageCodegen spans
- shuffle budget:  number of Exchange operators ≤ expected
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    text: str
    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_codegen_spans: int
    scans: list[dict] = field(default_factory=list)

    def pushed_filters(self) -> list[str]:
        return [s["pushed"] for s in self.scans if s.get("pushed")]

    def read_schemas(self) -> list[str]:
        return [s["schema"] for s in self.scans if s.get("schema")]


def audit_plan(df: DataFrame) -> PlanReport:
    """Parse the formatted physical plan into a PlanReport."""
    jvm = df.sparkSession._jvm
    text = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    scans = []
    # formatted mode lists operator details in sections; capture per-scan
    for sec in re.split(r"\n\n", text):
        if "Scan parquet" in sec or "PushedFilters" in sec or "ReadSchema" in sec:
            pushed = re.search(r"PushedFilters: \[(.*?)\]", sec)
            schema = re.search(r"ReadSchema: (\S+)", sec)
            if pushed or schema:
                scans.append(
                    {
                        "pushed": pushed.group(1) if pushed else "",
                        "schema": schema.group(1) if schema else "",
                    }
                )
    # formatted mode prints each operator twice (tree + numbered detail
    # section) — count the numbered details so each physical operator
    # counts once; ReusedExchange is excluded (it is a reuse, not a new
    # shuffle).
    def op_count(op: str) -> int:
        return len(re.findall(rf"\(\d+\) {op}\b", text))

    return PlanReport(
        text=text,
        n_exchanges=op_count("Exchange"),
        n_broadcast_joins=op_count("BroadcastHashJoin"),
        n_sortmerge_joins=op_count("SortMergeJoin"),
        n_codegen_spans=len(re.findall(r"WholeStageCodegen", text)),
        scans=scans,
    )
