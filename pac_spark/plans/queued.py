"""Specs QUEUED for the next driver rotation.

The registry's enforced tail policy (tests/test_registry_policy.py)
forbids a zero-driver-green spec riding past the 50-row cap, and the
current rotation's slots are fully claimed by new/under-verified
specs. Queued specs run the IDENTICAL local oracle gate now
(tests/test_oracle_parity.py appends them to the checked list) and
move into their home module's SPECS + the registry hoist list when a
rotation slot frees up (their code paths gain two driver greens).
"""

from __future__ import annotations

from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS_QUEUED"]


def _specs() -> list[QuerySpec]:
    from pac_spark.operators import graph as G
    from pac_spark.operators import profile as P
    from pac_spark.plans import llm_plans, temporal_plans

    orders_cols = [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp"),
        ("o_orderpriority", "string"),
    ]
    return (
        temporal_plans.SPECS_QUEUED
        + llm_plans.SPECS_QUEUED
        + [
            QuerySpec(
                "profile_orders",
                P.profile_orders,
                P.PROFILE_SQL("orders", orders_cols),
            ),
            QuerySpec(
                "pagerank_trade_graph",
                G.pagerank_trade_graph,
                G.PAGERANK_SQL(),
            ),
        ]
    )


SPECS_QUEUED = _specs()
