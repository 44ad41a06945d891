"""Registry entries for the table-analytics operators: one-scan
profiling, referential-integrity audit, exact-integer PageRank, and
the SCD2 snapshot diff. Promoted from ``plans/queued.py`` in the r5
rotation (VERDICT r4 next-#1) after riding the local oracle gate since
their r4 landing; their oracles live next to the operators they state
(``PROFILE_SQL`` / ``RI_SQL`` / ``PAGERANK_SQL`` / ``SCD2_SQL``).
"""

from __future__ import annotations

from pac_spark.functions.exact import money_sum_sql
from pac_spark.operators import evaluate as EV
from pac_spark.operators import graph as G
from pac_spark.operators import profile as P
from pac_spark.operators import recommend as RC
from pac_spark.operators import scd as SD
from pac_spark.plans.spec import QuerySpec

__all__ = ["SPECS"]

_ORDERS_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
]

SPECS = [
    QuerySpec(
        "profile_orders",
        P.profile_orders,
        P.PROFILE_SQL("orders", _ORDERS_COLS),
    ),
    QuerySpec(
        "referential_integrity_report",
        P.referential_integrity_report,
        P.RI_SQL(),
    ),
    QuerySpec("pagerank_trade_graph", G.pagerank_trade_graph, G.PAGERANK_SQL()),
    QuerySpec(
        "butterfly_supplier_pairs",
        G.butterfly_supplier_pairs,
        G.BUTTERFLY_SQL(),
    ),
    QuerySpec("scd2_customer_diff", SD.scd2_customer_diff, SD.SCD2_SQL()),
    QuerySpec(
        "scd2_history_customer",
        SD.scd2_history_customer,
        SD.SCD2_HISTORY_SQL(),
    ),
    QuerySpec(
        "scd2_pointintime_customer",
        SD.scd2_pointintime_customer,
        SD.SCD2_PIT_SQL(),
    ),
    # the IVM proof is deliberately NOT a replay of the incremental
    # path: the oracle aggregates the new table directly, so hash
    # equality shows delta maintenance == full recompute
    QuerySpec(
        "ivm_nation_balance",
        SD.ivm_nation_balance,
        f"""
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {money_sum_sql('c_acctbal')} AS total_acctbal
FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
""",
    ),
    # registered in the r7 rotation after a round staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec("triangle_top_parts", G.triangle_top_parts, G.TRIANGLE_SQL()),
    QuerySpec("expectations_orders", P.expectations_orders, P.EXPECTATIONS_SQL()),
    # registered in the r8 rotation after two rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "two_hop_reach_top_customers",
        G.two_hop_reach_top_customers,
        G.TWO_HOP_SQL,
    ),
    # registered in the r9 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "association_rules_parts",
        RC.association_rules_parts,
        RC.ASSOC_RULES_SQL,
    ),
    QuerySpec(
        "item_item_similar_parts",
        RC.item_item_similar_parts,
        RC.ITEM_ITEM_SQL,
    ),
    QuerySpec(
        "auc_value_predicts_purchase",
        EV.auc_value_predicts_purchase,
        EV.AUC_SQL,
    ),
    QuerySpec(
        "decile_lift_value_purchase",
        EV.decile_lift_value_purchase,
        EV.DECILE_LIFT_SQL,
    ),
    QuerySpec("kcore_parts", G.kcore_parts, G.KCORE_SQL),
    QuerySpec(
        "degree_assortativity",
        G.degree_assortativity,
        G.ASSORTATIVITY_SQL(),
    ),
    # registered in the r10 rotation after rounds staged behind the
    # identical local 3-SF oracle gates (tests/test_staged_specs.py)
    QuerySpec(
        "table_fingerprint_by_nation",
        P.table_fingerprint_by_nation,
        P.FINGERPRINT_SQL(),
    ),
    QuerySpec("fd_profile_orders", P.fd_profile_orders, P.FD_SQL()),
    QuerySpec("sssp_from_hub", G.sssp_from_hub, G.SSSP_SQL()),
    QuerySpec(
        "benford_price_audit", P.benford_price_audit, P.BENFORD_SQL()
    ),
    QuerySpec(
        "k_anonymity_customer_qi",
        P.k_anonymity_customer_qi,
        P.K_ANONYMITY_SQL(),
    ),
    QuerySpec(
        "ivm_join_nation_revenue",
        SD.ivm_join_nation_revenue,
        SD.IVM_JOIN_SQL(),
    ),
    # registered in the r11 rotation after a round staged behind the
    # identical local 3-SF oracle gate (tests/test_staged_specs.py)
    QuerySpec("lpa_communities", G.lpa_communities, G.LPA_SQL()),
]
