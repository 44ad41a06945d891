"""Plan auditor: a structured scale-legality readout over a
DataFrame's physical plan.

The repo's plan-shape tests assert scale claims (pushed filters,
broadcast vs shuffle joins, bounded exchange counts, no cartesian
products) by grepping ``executedPlan`` text ad hoc; this module makes
that a first-class engine surface a USER can call on their own query —
"is this plan still scale-legal?" — and gives the tests one shared
vocabulary. Counters, not judgments: the caller decides what is
acceptable for its operator (an iterative loop legitimately shows more
exchanges than a projection).

Text-parsing a plan string is deliberate: it works on any Spark
version's physical tree without touching private planner APIs beyond
``queryExecution`` (the same surface ``df.explain()`` prints).
"""

from __future__ import annotations

import re
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame

# first operator token on a physical-plan line, past tree characters
# (":  +- ") and the whole-stage-codegen star prefix ("*(3) ")
_NODE_NAME = re.compile(r"^[\s:+\-]*(?:\*\(\d+\)\s*)?([A-Za-z][A-Za-z0-9]*)")

__all__ = ["PlanAudit", "plan_audit", "assert_scale_legal"]


@dataclass(frozen=True)
class PlanAudit:
    scans: int                 # parquet file scans (corpus passes)
    exchanges: int             # shuffle boundaries (Exchange only)
    broadcast_exchanges: int   # small-side replications, not shuffles
    reused_exchanges: int      # dedup'd references to a prior exchange
    broadcast_joins: int
    sortmerge_joins: int
    cartesian_products: int    # > 0 is almost always a bug at scale
    window_group_limits: int   # partial top-k heaps before a window
    wholestage_spans: int      # codegen regions (JVM-side hot path)
    pushed_filters: bool       # any predicate reached a scan footer

    def as_dict(self) -> dict:
        return asdict(self)


def plan_audit(df: DataFrame) -> PlanAudit:
    """Counters over the EXECUTED physical plan of ``df`` (the plan
    ``df.explain()`` prints; AQE-finalized nodes appear once a query
    has run — audits of unexecuted frames see the initial physical
    plan, which is the honest pre-runtime claim)."""
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # an AQE plan that has RUN prints BOTH "== Final Plan ==" and
    # "== Initial Plan ==" sections — counting the whole string would
    # double every counter (and mix nodes from two different plans
    # when AQE re-planned a join). Audit the final section only
    # (code-review r8; reproduced: counters exactly doubled after
    # collect()).
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    # exchange kinds must be told apart by each line's NODE name, not
    # substring counts: "Exchange " is a substring of the other two
    # spellings, AND a ReusedExchange line EMBEDS its referenced
    # exchange's own text ("ReusedExchange [...], Exchange
    # hashpartitioning(...)"), so substring arithmetic over-counts by
    # one per reuse. The node name is the first word after the
    # tree-drawing/codegen prefix ("+- ", ": ", "*(3) ").
    nodes = [
        m.group(1)
        for m in (_NODE_NAME.match(line) for line in plan.splitlines())
        if m
    ]
    return PlanAudit(
        # "Scan parquet" is a substring of "FileScan parquet", so one
        # count covers both spellings without double-counting
        scans=plan.count("Scan parquet"),
        exchanges=nodes.count("Exchange"),
        broadcast_exchanges=nodes.count("BroadcastExchange"),
        reused_exchanges=nodes.count("ReusedExchange"),
        broadcast_joins=plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        cartesian_products=plan.count("CartesianProduct"),
        window_group_limits=plan.count("WindowGroupLimit"),
        # codegen regions render as "*(n)" line prefixes in the plan
        # string (the literal "WholeStageCodegen" never appears in
        # simple mode — the old count was a dead always-0 readout;
        # code-review r8): distinct region ids = distinct codegen spans
        wholestage_spans=len(set(re.findall(r"\*\((\d+)\)", plan))),
        pushed_filters="PushedFilters: [" in qe.toString().replace(
            "PushedFilters: []", ""
        ),
    )


def assert_scale_legal(
    df: DataFrame,
    max_scans: int | None = None,
    max_exchanges: int | None = None,
    require_window_group_limit: bool = False,
) -> PlanAudit:
    """Raise AssertionError when ``df``'s plan violates the caller's
    scale budget; always rejects cartesian products. Returns the audit
    so callers can assert further fields. Explicit raises (not bare
    asserts) so ``python -O`` cannot strip this user-facing contract
    into a no-op — the same rotation/registry lesson (code-review r8).
    """
    a = plan_audit(df)
    if a.cartesian_products != 0:
        raise AssertionError(f"cartesian product in plan: {a}")
    if max_scans is not None and a.scans > max_scans:
        raise AssertionError(f"{a.scans} scans > {max_scans}: {a}")
    if max_exchanges is not None and a.exchanges > max_exchanges:
        raise AssertionError(f"{a.exchanges} exchanges > {max_exchanges}: {a}")
    if require_window_group_limit and a.window_group_limits == 0:
        raise AssertionError(f"no WindowGroupLimit: {a}")
    return a
