"""Physical-plan introspection: parse ``EXPLAIN FORMATTED`` output into
checkable facts (pushed filters, read schemas, join strategies, shuffle
counts, codegen coverage).

The reference engine's only introspection is its invocation-graph trace
(reference: mr/trace.py:63-334 — a BFS over etcd relationship trees
rendered with graphviz); jobx_spark.trace covers that parity. This
module is the *optimizer-facing* half: it exists so plan quality is
TESTED, not eyeballed — tests/test_plans.py pins down that filters
reach the parquet scan, projections prune the read schema, small dims
broadcast, and top-k never turns into a full sort. Those properties are
exactly what keeps a query viable when the input grows 1000×, so they
are asserted in CI like any other correctness property.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The plan string ``df.explain(mode)`` would print."""
    jvm = df.sparkSession._jvm
    explain_mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(explain_mode)


_NODE_RE = re.compile(r"^\((\d+)\)\s+(\S+)", re.MULTILINE)
_CODEGEN_RE = re.compile(r"codegen id : (\d+)")


@dataclass
class ScanInfo:
    location: str = ""
    pushed_filters: list[str] = field(default_factory=list)
    read_columns: list[str] = field(default_factory=list)


def node_names(plan: str) -> list[str]:
    """Physical operator names in the detail section, e.g.
    ['Scan', 'Filter', 'Project', 'Exchange', ...]."""
    return [m.group(2) for m in _NODE_RE.finditer(plan)]


def has_node(plan: str, name: str) -> bool:
    return any(n == name for n in node_names(plan))


def count_nodes(plan: str, name: str) -> int:
    return sum(1 for n in node_names(plan) if n == name)


def count_shuffles(plan: str) -> int:
    """Shuffle exchanges only — BroadcastExchange is deliberately NOT a
    shuffle (it is the thing that avoids one)."""
    return count_nodes(plan, "Exchange")


def codegen_stage_count(plan: str) -> int:
    """Distinct whole-stage-codegen spans; 0 means everything is
    interpreted (or Python-side) — the hot path should be > 0."""
    return len(set(_CODEGEN_RE.findall(plan)))


def scans(plan: str) -> list[ScanInfo]:
    """Every parquet scan's pushed filters and read schema."""
    out: list[ScanInfo] = []
    current: ScanInfo | None = None
    for line in plan.splitlines():
        stripped = line.strip()
        if re.match(r"^\(\d+\) Scan parquet", stripped):
            current = ScanInfo()
            out.append(current)
        elif current is not None:
            if stripped.startswith("Location:"):
                current.location = stripped.split(":", 1)[1].strip()
            elif stripped.startswith("PushedFilters:"):
                inner = stripped.split(":", 1)[1].strip().strip("[]")
                current.pushed_filters = (
                    [f.strip() for f in re.split(r",\s*(?![^()]*\))", inner)]
                    if inner
                    else []
                )
            elif stripped.startswith("ReadSchema:"):
                struct = stripped.split(":", 1)[1].strip()
                current.read_columns = re.findall(r"(\w+):", struct)
            elif re.match(r"^\(\d+\)", stripped):
                current = None
    return out


def scan_for(plan: str, table: str) -> ScanInfo | None:
    """The scan whose file location mentions ``table``."""
    for s in scans(plan):
        if table in s.location:
            return s
    return None


def plan_report(df: DataFrame) -> dict:
    """One-glance summary used by tests and the plan audit."""
    plan = plan_str(df)
    return {
        "nodes": node_names(plan),
        "shuffles": count_shuffles(plan),
        "broadcasts": count_nodes(plan, "BroadcastExchange"),
        "codegen_stages": codegen_stage_count(plan),
        "scans": [
            {
                "location": s.location.rsplit("/", 1)[-1].rstrip("]"),
                "pushed_filters": s.pushed_filters,
                "read_columns": s.read_columns,
            }
            for s in scans(plan)
        ],
    }
