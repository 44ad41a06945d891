"""observe()-based DQ metrics: same numbers as standalone aggregates,
collected by the SAME job as the observed action (no second scan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pac_spark import catalog
from pac_spark.quality import observe_quality, standard_quality_metrics


def test_observed_metrics_match_standalone_aggregates(spark, sf_dir):
    orders = catalog.load(spark, sf_dir, "orders")
    observed, metrics = observe_quality(
        orders, standard_quality_metrics(orders, ["o_orderkey"], ["o_totalprice"])
    )
    # one real downstream action — a filtered aggregate, as an ingest
    # pipeline would run; the metrics still cover the FULL input
    # because the observe node sits above the scan
    observed.groupBy("o_orderpriority").count().collect()
    got = metrics()

    want = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderkey").isNull().cast("long")).alias("null_o_orderkey"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias(
            "null_o_totalprice"
        ),
        F.sum((F.col("o_totalprice") < 0).cast("long")).alias("neg_o_totalprice"),
    ).collect()[0]
    assert got["n_rows"] == want["n_rows"] > 0
    assert got["null_o_orderkey"] == want["null_o_orderkey"]
    assert got["null_o_totalprice"] == want["null_o_totalprice"]
    assert got["neg_o_totalprice"] == want["neg_o_totalprice"]


def test_observed_metrics_survive_a_write(spark, sf_dir, tmp_path):
    """The ingest shape: metrics ride the WRITE job itself."""
    ev = catalog.load(spark, sf_dir, "events").select("event_id", "value")
    observed, metrics = observe_quality(
        ev, {"n_rows": F.count(F.lit(1)), "sum_cents": F.sum(
            F.round(F.col("value") * 100).cast("long"))}
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = metrics()
    n = ev.count()
    assert got["n_rows"] == n
    assert spark.read.parquet(str(tmp_path / "out")).count() == n
