"""salted_join contract: identical results to the plain join, with the
salt genuinely in the join key so a hot key spreads across tasks."""

from __future__ import annotations

from pyspark.sql import functions as F

from pac_spark.functions.salting import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    # event_type has ~5 distinct values over 10k rows — exactly the
    # kind of key that hot-spots a shuffle join
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    dim = (
        events.select("event_type")
        .distinct()
        .withColumn("type_code", F.upper(F.col("event_type")))
    )
    plain = {
        tuple(r)
        for r in events.join(dim, ["event_type"]).select(
            "event_id", "event_type", "type_code"
        ).collect()
    }
    salted = salted_join(events, dim, ["event_type"], n_salts=8)
    got = {
        tuple(r)
        for r in salted.select("event_id", "event_type", "type_code").collect()
    }
    assert got == plain

    # the salt must be part of the physical join key, not dropped early
    from pac_spark.functions.salting import _SALT_COL

    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert _SALT_COL in plan


def test_salted_join_rejects_small_side_preserving_types(spark, sf_dir):
    """right/full outer would emit unmatched small-side rows once per
    salt replica — the function must refuse, not silently duplicate."""
    import pytest

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type"
    )
    dim = spark.createDataFrame([("click", 1)], "event_type string, code int")
    for how in ("right", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="salt replica"):
            salted_join(events, dim, ["event_type"], how=how)


def test_salted_join_guards(spark, sf_dir):
    """A pre-existing internal salt column must raise (not be silently
    overwritten), and map-typed columns must be excluded from salt
    derivation instead of blowing up xxhash64."""
    import pytest
    from pac_spark.functions.salting import _SALT_COL

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type"
    )
    dim = spark.createDataFrame([("click", 1)], "event_type string, code int")

    with pytest.raises(ValueError, match="salt column"):
        salted_join(events.withColumn(_SALT_COL, F.lit(0)), dim, ["event_type"])
    with pytest.raises(ValueError, match="salt column"):
        salted_join(events, dim.withColumn(_SALT_COL, F.lit(0)), ["event_type"])

    # a map column on the big side: salt derives from the other columns
    with_map = events.withColumn(
        "props_map", F.create_map(F.lit("k"), F.col("event_type"))
    )
    plain = {
        tuple(r)
        for r in with_map.join(dim, ["event_type"]).select("event_id", "code").collect()
    }
    got = {
        tuple(r)
        for r in salted_join(with_map, dim, ["event_type"], n_salts=4)
        .select("event_id", "code")
        .collect()
    }
    assert got == plain

    # a frame of ONLY map columns has nothing to hash — explicit error
    only_map = with_map.select("event_type", "props_map")
    with pytest.raises(ValueError, match="hashable"):
        salted_join(only_map, dim, ["event_type"])


def test_salted_outer_join_keeps_unmatched(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type"
    )
    dim = spark.createDataFrame(
        [("click", 1)], "event_type string, code int"
    )
    plain = events.join(dim, ["event_type"], "left").select(
        "event_id", "code"
    )
    salted = salted_join(events, dim, ["event_type"], n_salts=4, how="left")
    assert {tuple(r) for r in salted.select("event_id", "code").collect()} == {
        tuple(r) for r in plain.collect()
    }
