"""Operators STAGED for the r6 rotation (the r5 driver cap is fully
claimed — see the R6 plan in plans/registry.py): run the IDENTICAL
value-hash oracle gate locally until each gets its driver slot.
pcm_audio_features has its gate in test_multimodal_multibyte.py; this
file covers pq_topk.
"""

from __future__ import annotations


def test_pq_topk_oracle(spark, duck, sf_dir):
    from pac_spark.operators.similarity import pq_topk
    from pac_spark.plans.llm_plans import _pq_topk_sql
    from tests.conftest import assert_oracle_match

    assert_oracle_match(pq_topk(spark, sf_dir), duck.sql(_pq_topk_sql()))


def test_pq_rescore_matches_bruteforce(spark, sf_dir):
    """The ADC ranking is approximate, but every returned (query, hit)
    pair's exact-cosine rescore must equal the brute-force score for
    that pair — the same exactness contract the IVF tier carries."""
    from pac_spark.operators.similarity import knn_bruteforce, pq_topk

    exact = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in knn_bruteforce(spark, sf_dir).collect()
    }
    got = pq_topk(spark, sf_dir).collect()
    assert got, "PQ search returned nothing"
    for r in got:
        assert r["approx_dist"] is not None and r["approx_dist"] >= 0
        if (r["query_id"], r["vec_id"]) in exact:
            assert abs(exact[(r["query_id"], r["vec_id"])] - r["score"]) < 1e-9


def test_streaming_ivm_matches_batch_aggregate(spark, duck, sf_dir):
    """Staged for r7: per-micro-batch IVM folding must equal the full
    batch aggregate (same identical-oracle gate the driver will run)."""
    from pac_spark.streaming.stateful import (
        STREAMING_IVM_ORACLE,
        streaming_ivm_user_value,
    )
    from tests.conftest import assert_oracle_match

    assert_oracle_match(
        streaming_ivm_user_value(spark, sf_dir), duck.sql(STREAMING_IVM_ORACLE)
    )
