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

# expression ids (#123, #45L) and exchange plan ids are per-site
# aliases, not identity — normalized out of cached-relation keys
_IDS = re.compile(r"#\d+L?|plan_id=\d+")
# key normalization additionally strips the attribute NAME in front of
# its id: renamed read sites must key to the same relation (see
# _split_cached_subtrees docstring)
_NAMED_IDS = re.compile(r"\w+#\d+L?|#\d+L?|plan_id=\d+")

# leading tree-drawing characters of a plan line (":  ", "+- ", bars)
_TREE_PREFIX = re.compile(r"^[\s:+\-]*")


def _line_col(line: str, m: "re.Match | None") -> int | None:
    """Effective tree column of a plan line: the node name's start for
    ordinary nodes, the indentation end for AQE section headers
    ("== Final/Initial Plan ==" — no parseable node name, but their
    indentation still states which subtree owns them), None for lines
    with neither (blank continuations)."""
    if m:
        return m.start(1)
    if "== " in line:
        return _TREE_PREFIX.match(line).end()
    return None

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


def _split_cached_subtrees(plan: str) -> tuple[str, dict[str, str]]:
    """(live plan text, {relation key: stored build-plan text}).

    A pinned/persisted frame renders as ``InMemoryTableScan`` whose
    cached ``InMemoryRelation`` child — including its original
    ``FileScan`` and ``Exchange`` nodes — is printed underneath but is
    NEVER re-executed by this query: it ran once, at pin
    materialization, no matter how many sites read the cache. Counting
    those lines per read site over-reported a correctly-pinned plan as
    a scan storm (the staged plan-audit campaign read 6 scans on
    ``prefix_filter_neardup_pairs`` where the corpus is scanned once —
    plan-audit campaign r8), so the build plans are split out here and
    the auditor bills each DISTINCT relation once. Subtree membership
    is by node-name column: a line belongs to the cached subtree while
    its operator name starts strictly right of the
    ``InMemoryTableScan``'s; lines without a parseable node name
    (section headers like ``== Final Plan ==`` that a cached AQE plan
    embeds) take their COLUMN from their indentation instead — a
    nested cached AQE's own section headers sit deeper than the
    ``InMemoryTableScan`` and stay inside its subtree, while the
    ENCLOSING plan's "== Initial Plan ==" header sits shallower and
    correctly ends it (swallowing that header made the enclosing
    initial-plan section leak into the live text and double-count
    scans — caught on the funnel cascade's nested pins, plan-audit
    campaign r8). Only truly column-less lines (blank) stay inside
    unconditionally. Relations are keyed by their build-plan
    BODY with expression/plan ids AND attribute names normalized out —
    every read site of one cached frame re-aliases its output to fresh
    expression ids, and a read site that RENAMES columns (a self-join's
    la/lb split) collapses the new names into the relation header, so
    both ids and names distinguish read SITES, not relations (first
    version keyed on the header line and billed one pin three times;
    keeping names billed the label_centroid_cosine sums pin once per
    rename — Spark's own cache lookup canonicalizes attribute names
    away via sameResult, so name-blind keys mirror the real cache).
    Two separate pins of byte-identical pipelines would collapse to
    one key; they are the same cost center — and Spark's plan-keyed
    cache dedupes them too — so that is the honest direction to err."""
    out: list[str] = []
    cached: dict[str, str] = {}
    lines = plan.splitlines()
    i = 0
    while i < len(lines):
        line = lines[i]
        # an initial-plan header seen OUTSIDE any cached subtree is
        # this plan's own "== Initial Plan ==" section: stop — its
        # nodes duplicate the final section's, and its COPIES of
        # cached reads render without QueryStage wrappers, so they
        # key differently and would bill every relation twice
        # (reproduced on the funnel cascade and budget allocation:
        # scans exactly doubled). Nested initial markers are only
        # ever encountered inside the capture loop below, so they
        # stay with their relation.
        if "== Initial Plan ==" in line:
            break
        m = _NODE_NAME.match(line)
        col = _line_col(line, m)
        out.append(line)
        i += 1
        if m and m.group(1) == "InMemoryTableScan":
            sub: list[str] = []
            # Spark DEDENTS doubly-nested innerChildren: a cached
            # relation inside another relation's stored build prints
            # its own section block at a column SHALLOWER than its
            # InMemoryTableScan anchor (observed on the budget
            # allocation rev-inside-based plan: anchor col 45, the
            # inner "== Final Plan ==" restarts at col 27). A section
            # header below the threshold therefore LOWERS the
            # threshold — the block still belongs to this relation —
            # while a real NODE at or left of it ends the subtree.
            threshold = col
            while i < len(lines):
                m2 = _NODE_NAME.match(lines[i])
                c2 = _line_col(lines[i], m2)
                if c2 is not None and c2 <= threshold:
                    if m2:
                        break
                    threshold = c2 - 1
                sub.append(lines[i])
                i += 1
            # tree-drawing prefixes (":  +- ") depend on the read
            # site's depth in the OUTER tree — strip them per line so
            # the same build plan keys identically from every site.
            # The key also CUTS at the relation's own first
            # "== Initial Plan ==" marker: a dedent-extended capture
            # can absorb trailing text of the ENCLOSING build (see
            # threshold note above), and the initial-section rendering
            # varies with AQE state — the final section is the stable
            # identity (without the cut, a triply-nested pin keyed
            # differently per site and billed twice; funnel cascade,
            # plan-audit campaign r8). Counting is unaffected: the
            # recursive walk over the stored text stops at that same
            # marker.
            body = "\n".join(_TREE_PREFIX.sub("", s) for s in sub)
            idx = body.find("InMemoryRelation")
            body = body[idx:] if idx >= 0 else body
            # rstrip after the cut: a site that swallowed the
            # enclosing initial-plan header keeps a trailing newline
            # the other sites lack, and a no-AQE pin (no own marker)
            # would key differently per site and double-bill its
            # build (code-review r8)
            body = body.split("== Initial Plan ==", 1)[0].rstrip()
            key = _NAMED_IDS.sub("#", body)
            cached.setdefault(key, "\n".join(sub))
    return "\n".join(out), cached


def plan_audit(df: DataFrame) -> PlanAudit:
    """Counters over the EXECUTED physical plan of ``df`` (the plan
    ``df.explain()`` prints; AQE-finalized nodes appear once a query
    has run — audits of unexecuted frames see the initial physical
    plan, which is the honest pre-runtime claim).

    End-to-end accounting for caches: the live plan's counters PLUS
    each DISTINCT cached relation's stored build plan counted ONCE —
    a pin's build scan happened exactly once no matter how many sites
    read the cache, and not at all is equally wrong (the build IS part
    of what the query costs a cluster)."""
    qe = df._jdf.queryExecution()
    live, cached = _split_cached_subtrees(qe.executedPlan().toString())
    texts = [live]
    # cached builds may themselves read deeper caches; walk each
    # distinct relation once (keys dedup repeated read sites)
    seen = set(cached)
    frontier = list(cached.values())
    while frontier:
        sub_live, sub_cached = _split_cached_subtrees(frontier.pop())
        texts.append(sub_live)
        for k, v in sub_cached.items():
            if k not in seen:
                seen.add(k)
                frontier.append(v)
    # exchange kinds must be told apart by each line's NODE name, not
    # substring counts: "Exchange " is a substring of the other two
    # spellings, AND a ReusedExchange line EMBEDS its referenced
    # exchange's own text ("ReusedExchange [...], Exchange
    # hashpartitioning(...)"), so substring arithmetic over-counts by
    # one per reuse. The node name is the first word after the
    # tree-drawing/codegen prefix ("+- ", ": ", "*(3) ").
    nodes = [
        m.group(1)
        for t in texts
        for m in (_NODE_NAME.match(line) for line in t.splitlines())
        if m
    ]

    def count(needle: str) -> int:
        return sum(t.count(needle) for t in texts)

    return PlanAudit(
        # "Scan parquet" is a substring of "FileScan parquet", so one
        # count covers both spellings without double-counting
        scans=count("Scan parquet"),
        exchanges=nodes.count("Exchange"),
        broadcast_exchanges=nodes.count("BroadcastExchange"),
        reused_exchanges=nodes.count("ReusedExchange"),
        broadcast_joins=count("BroadcastHashJoin")
        + count("BroadcastNestedLoopJoin"),
        sortmerge_joins=count("SortMergeJoin"),
        cartesian_products=count("CartesianProduct"),
        window_group_limits=count("WindowGroupLimit"),
        # codegen regions render as "*(n)" line prefixes in the plan
        # string (the literal "WholeStageCodegen" never appears in
        # simple mode — the old count was a dead always-0 readout;
        # code-review r8): distinct region ids = distinct codegen
        # spans, per plan text (live + each build compiles its own)
        wholestage_spans=sum(
            len(set(re.findall(r"\*\((\d+)\)", t))) for t in texts
        ),
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


def _staged_fns() -> dict:
    """Resolve the rotation's STAGED_QUEUE names to their operator
    callables (staged operators are plain ``(spark, sf_dir)``
    functions in the operators/streaming packages, not registered
    specs — the name IS the function name). Streaming specs are
    skipped: their returned batch frame's plan says nothing about the
    micro-batch plans that produced it."""
    import importlib
    import pkgutil

    import pac_spark.operators as _ops
    import pac_spark.streaming as _str
    from pac_spark.plans.rotation import STAGED_QUEUE

    mods = [
        importlib.import_module(f"{pkg.__name__}.{m.name}")
        for pkg in (_ops, _str)
        for m in pkgutil.iter_modules(pkg.__path__)
    ]
    out = {}
    for name in STAGED_QUEUE:
        if name.startswith("streaming_"):
            continue
        for mod in mods:
            fn = getattr(mod, name, None)
            if callable(fn):
                out[name] = fn
                break
    return out


def _sweep(sf_dir: str, include_staged: bool = True) -> None:
    """Registry-wide (+ staged-surface) audit: run every query at
    ``sf_dir``, audit its executed plan, and print the rows that
    deserve a look (descending scans, then exchanges; cartesian
    products always). The r8 campaign over this sweep caught the
    executive_records 4-way-union rescan (16 scans -> 2), un-pinned
    multi-consumer frames in budget_allocation / funnel / set-ops /
    mix-drift, and the un-cut Lloyd-loop lineage in
    pq_topk/ann_ivf_topk (~300 lineage exchanges -> ~12)."""
    from pac_spark.cache import release_caches
    from pac_spark.plans.registry import queries
    from pac_spark.session import get_spark

    # the engine session builder, not a bare SparkSession: it carries
    # the REQUIRED confs (nanos-typed events parquet, ICU case-mapping
    # kill switch, UTC) without which whole query families error out
    # of the sweep and silently shrink its coverage (code-review r8)
    spark = get_spark(
        app_name="pac_spark_plan_audit", master="local[8]", shuffle_partitions=8
    )
    targets = dict(queries())
    if include_staged:
        targets.update(
            (f"{n} [staged]", fn) for n, fn in _staged_fns().items()
        )
    rows = []
    for name, fn in targets.items():
        try:
            df = fn(spark, sf_dir)
            df.count()
            rows.append((name, plan_audit(df)))
        except Exception as e:  # surface, keep sweeping
            print(f"{name:42s} ERROR {type(e).__name__}: {str(e)[:90]}")
        finally:
            release_caches(all_generations=True)
    for name, a in rows:
        if a.cartesian_products:
            print(f"{name:42s} CARTESIAN x{a.cartesian_products}")
    for name, a in sorted(rows, key=lambda r: (-r[1].scans, -r[1].exchanges))[:20]:
        print(
            f"{name:42s} scans={a.scans} ex={a.exchanges} "
            f"bex={a.broadcast_exchanges} reuse={a.reused_exchanges} "
            f"smj={a.sortmerge_joins} push={a.pushed_filters}"
        )
    spark.stop()


if __name__ == "__main__":
    import os
    import sys

    _sweep(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get("PAC_TEST_SF_DIR", "/root/testdata/sf0.01")
    )
