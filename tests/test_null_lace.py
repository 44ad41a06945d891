"""NULL-laced regression pins: the specs the r8 NULL-laced sweep
(.claude/skills/verify/null_sweep.py) caught diverging between engines
when nullable non-key columns actually carry NULLs.

The full sweep runs every registered batch spec over laced copies of
all ten tables (~15 min — an audit tool, not CI); this test pins just
the specs it caught, over the same lacing, so their now-stated NULL
contracts cannot silently regress. The bug class: Spark windows sort
NULLS FIRST while DuckDB sorts NULLS LAST (cumulative read-offs shift
oppositely), Spark's collect_set of zero rows is an empty array while
DuckDB's filtered LIST is NULL, and non-null-safe joins drop NULL
groups one engine keeps.
"""

from __future__ import annotations

import pytest

# the r8 sweep's catch list — each diverged (or errored) before its
# NULL contract was stated in both engines
CAUGHT = (
    "pq_topk",  # ERROR: NULL embedding poisoned the ADC code lookup
    "ks_test_price_by_flag",  # NULL cents group shifted the ECDF sup
    "winsorized_price_stats_by_flag",  # clip-bound read-off shifted
    "lang_quality_quantiles",  # NULL-lang group kept by oracle only
    "window_distribution_stats",  # NULL-priority class kept by oracle
    "token_budget_mix",  # NULL-lang docs budgeted by oracle only
    "er_consolidated",  # all-NULL title cluster: '' vs NULL
    "er_approved",
)

# one laced row per column with exactly that column NULL, plus one row
# with every laceable column NULL (same construction as the sweep)
LACE = {
    "documents": ("doc_id", ["text", "lang", "source"]),
    "events": ("event_id", ["event_type", "value"]),
    "embeddings": ("vec_id", ["label", "embedding"]),
    "orders": ("o_orderkey", ["o_orderpriority", "o_orderstatus", "o_totalprice"]),
    "lineitem": (None, ["l_returnflag", "l_extendedprice", "l_discount", "l_quantity"]),
    "customer": ("c_custkey", ["c_mktsegment", "c_name", "c_acctbal"]),
    "part": ("p_partkey", ["p_type", "p_brand", "p_name", "p_retailprice", "p_size"]),
    "supplier": ("s_suppkey", ["s_name", "s_acctbal"]),
    "nation": (None, []),
    "region": (None, []),
}


@pytest.fixture(scope="module")
def laced_dir(sf_dir, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = tmp_path_factory.mktemp("nulllace")
    for name, (key, cols) in LACE.items():
        t = pq.read_table(f"{sf_dir}/{name}.parquet")
        if cols:
            rows = t.to_pylist()
            base = rows[: min(len(rows), len(cols) + 1)]
            maxkey = max(r[key] for r in rows) if key else None
            extra = []
            for i, c in enumerate(cols):
                r = dict(base[i % len(base)])
                r[c] = None
                if key:
                    maxkey += 1
                    r[key] = maxkey
                extra.append(r)
            r = dict(base[0])
            for c in cols:
                r[c] = None
            if key:
                maxkey += 1
                r[key] = maxkey
            extra.append(r)
            t = pa.concat_tables([t, pa.Table.from_pylist(extra, schema=t.schema)])
        pq.write_table(t, dst / f"{name}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def laced_duck(laced_dir):
    import glob
    import os

    import duckdb

    con = duckdb.connect()
    for path in glob.glob(os.path.join(laced_dir, "*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()


@pytest.mark.parametrize("name", CAUGHT)
def test_null_laced_spec_matches_oracle(spark, laced_dir, laced_duck, name):
    from pac_spark.plans.registry import all_specs
    from tests.conftest import assert_oracle_match

    spec = {s.name: s for s in all_specs()}[name]
    assert_oracle_match(spec.fn(spark, laced_dir), laced_duck.sql(spec.oracle))


# the STAGED specs the same lacing caught when the staged gate suite
# ran with PAC_TEST_SF_DIR pointed at a laced directory (they are not
# in the registry yet, so the registry-driven pin above cannot cover
# them): (spark_fn, oracle_sql_thunk) pairs, compared identically
def _staged_caught():
    from pac_spark.operators import curation as CU
    from pac_spark.operators import profile as PR
    from pac_spark.operators import stats as ST
    from pac_spark.operators import text as TX
    from pac_spark.plans import llm_plans as L

    def spearman_sql():
        return f"WITH stats AS ({L._TEXT_STATS.strip()})" + TX.SPEARMAN_SQL_TAIL()

    return [
        ("percentiles_cont", ST.percentiles_cont_price_by_flag, lambda: ST.PCT_CONT_SQL),
        ("weighted_percentiles", ST.weighted_percentiles_price_by_flag, lambda: ST.WEIGHTED_PCT_SQL()),
        ("table_fingerprint", PR.table_fingerprint_by_nation, lambda: PR.FINGERPRINT_SQL()),
        ("quantile_normalize", TX.quantile_normalized_quality, lambda: L.QNORM_SQL),
        ("epoch_interleave", CU.epoch_interleave_positions, lambda: CU.EPOCH_INTERLEAVE_SQL),
        ("spearman", TX.spearman_quality_tokens_by_lang, spearman_sql),
    ]


@pytest.mark.parametrize(
    "name,fn,sql", _staged_caught(), ids=[t[0] for t in _staged_caught()]
)
def test_null_laced_staged_spec_matches_oracle(
    spark, laced_dir, laced_duck, name, fn, sql
):
    from tests.conftest import assert_oracle_match

    assert_oracle_match(fn(spark, laced_dir), laced_duck.sql(sql()))
