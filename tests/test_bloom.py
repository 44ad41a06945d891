"""The bloom-filter pruning contract: zero false negatives (every
inserted key passes the probe), a sane false-positive rate, and the
point of the exercise — the probe-side row count actually shrinks
before the join shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pac_spark.functions.bloom import bloom_might_contain, build_bloom


def test_bloom_has_no_false_negatives(spark):
    keys = spark.range(0, 3000).select((F.col("id") * 7 + 3).alias("k"))
    bf = build_bloom(keys, "k")
    missed = keys.filter(~bloom_might_contain(bf, F.col("k"))).count()
    assert missed == 0, "bloom filters must never reject an inserted key"


def test_bloom_false_positive_rate_is_sane(spark):
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    bf = build_bloom(keys, "k")
    # probe a disjoint key range; with m=64Kbit, k=4, n=2000 the
    # theoretical FPR is ~0.03%, so 2% is a generous ceiling
    probes = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probes.filter(bloom_might_contain(bf, F.col("k"))).count()
    assert fp / 20_000 < 0.02, f"false-positive rate too high: {fp}/20000"


def test_bloom_pruning_shrinks_the_probe_side(spark, sf_dir):
    """The registered query's whole reason to exist: the map-side
    pre-filter must pass only a small superset of the true matching
    rows, never the full fact table."""
    from pac_spark import catalog
    from pac_spark.operators.scale import (
        _BLOOM_MIN_TOTAL,
        _BLOOM_PRIORITY,
    )

    orders = catalog.load(spark, sf_dir, "orders")
    dim = orders.filter(
        (F.col("o_orderpriority") == _BLOOM_PRIORITY)
        & (F.col("o_totalprice") > _BLOOM_MIN_TOTAL)
    )
    bf = build_bloom(dim.select("o_orderkey"), "o_orderkey")
    li = catalog.load(spark, sf_dir, "lineitem")
    total = li.count()
    pruned = li.filter(bloom_might_contain(bf, F.col("l_orderkey"))).count()
    true_matches = li.join(dim, li.l_orderkey == dim.o_orderkey).count()
    assert true_matches <= pruned, "pruning dropped true matches"
    # superset slack is false positives only; at this FPR the pruned
    # count must stay well under half the table when the dim is
    # selective (it is: a few percent of orders)
    assert pruned < total * 0.5, f"bloom pruned nothing: {pruned}/{total}"


def test_bloom_pruned_join_matches_plain_join(spark, sf_dir, duck):
    from pac_spark.operators.scale import bloom_pruned_orders_join
    from pac_spark.plans.scale_plans import _BLOOM_PRUNED
    from tests.conftest import assert_oracle_match

    assert_oracle_match(bloom_pruned_orders_join(spark, sf_dir), duck.sql(_BLOOM_PRUNED))
