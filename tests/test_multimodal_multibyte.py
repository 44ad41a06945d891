"""Multibyte regression for the multimodal byte oracles (ADVICE r3):
the Spark side resamples UTF-8 payload BYTES; the DuckDB oracles must
agree even when documents carry real multibyte text — the shipped
fixtures are pure ASCII, so this test plants its own corpus with
2-byte (é), 3-byte (CJK), and 4-byte (emoji) code points plus an empty
doc, writes it as a documents.parquet, and runs both sides on it.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pac_spark.operators import multimodal as MM
from tests.conftest import assert_oracle_match

DOCS = [
    (1, "héllo wörld", "de", "web", 11),
    (2, "你好世界 测试 文本", "zh", "books", 10),
    (3, "emoji 🚀 mix é 中", "en", "web", 15),
    (4, "", "en", "web", 0),
    (5, "plain ascii text", "en", "code", 16),
    # NULL text: the oracles emit the encode(NULL) row (NULL counts,
    # zero-fill sums, sentinel firsts); the UDFs must match instead of
    # crashing the Python worker on len(None) (code-review r8)
    (6, None, "en", "web", 0),
]


@pytest.fixture(scope="module")
def mb_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("mb_corpus")
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def mb_duck(mb_dir):
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(mb_dir, 'documents.parquet', '*.parquet')}'"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["multimodal_byte_features", "multimodal_frame_sample", "multimodal_resize"]
)
def test_byte_oracles_survive_multibyte(spark, mb_dir, mb_duck, name):
    from pac_spark.plans.llm_plans import SPECS

    spec = next(s for s in SPECS if s.name == name)
    assert_oracle_match(spec.fn(spark, mb_dir), mb_duck.sql(spec.oracle))


def test_fixture_is_genuinely_multibyte(spark, mb_dir):
    """Guard against the guard: the planted corpus must contain docs
    where byte length != char length, or this file tests nothing."""
    df = spark.read.parquet(os.path.join(mb_dir, "documents.parquet"))
    from pyspark.sql import functions as F

    n_mb = df.filter(
        F.length(F.encode("text", "UTF-8")) != F.length("text")
    ).count()
    assert n_mb >= 3


def test_pcm_audio_oracle(spark, duck, sf_dir):
    """pcm_audio_features staged for the r6 rotation: run the identical
    value-hash oracle gate locally until it gets a driver slot."""
    from pac_spark.operators.multimodal import PCM_AUDIO_SQL, pcm_audio_features
    from tests.conftest import assert_oracle_match

    assert_oracle_match(pcm_audio_features(spark, sf_dir), duck.sql(PCM_AUDIO_SQL))


def test_pcm_audio_crafted_edges(spark, duck):
    """Edge shapes the corpus can't guarantee: empty payload, single
    sample, odd trailing byte, negative samples, sign changes."""
    import pandas as pd

    from pac_spark.operators.multimodal import PCM_AUDIO_SQL, pcm_audio_features
    from tests.conftest import assert_oracle_match

    rows = [
        (1, ""),                      # empty
        (2, "a"),                     # one byte -> zero samples
        (3, "ab"),                    # one sample
        (4, "abé"),              # multibyte char -> odd byte count
        (5, "hello world ÿÿ"),  # high bytes -> negative samples
        (6, "a0Z9a0Z9"),              # alternating values
        (7, None),                    # NULL text -> oracle's NULL row
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    spark.createDataFrame(pdf).createOrReplaceTempView("pcm_docs")
    con = duck
    con.register("pcm_docs_pd", pdf)
    # run both sides against the crafted frame by name substitution
    from pac_spark.operators import multimodal as MM

    corpus = spark.table("pcm_docs").select(
        "doc_id",
        MM.F.encode("text", "UTF-8").alias("payload"),
    )
    feats = corpus.mapInPandas(MM._pcm_batches, schema=MM._PCM_SCHEMA)
    rms = MM.F.when(
        MM.F.col("n_samples") > 0,
        MM.F.round(
            MM.F.sqrt(
                MM.F.col("energy").cast("double")
                / MM.F.col("n_samples").cast("double")
            ),
            8,
        ),
    )
    sdf = feats.withColumn("rms", rms).orderBy("doc_id")
    oracle_sql = PCM_AUDIO_SQL.replace("FROM documents", "FROM pcm_docs_pd")
    assert_oracle_match(sdf, con.sql(oracle_sql))
