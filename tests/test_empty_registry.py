"""ANSI-mode landmine sweep over the ENTIRE registry: every registered
BATCH spec must run on schema-identical EMPTY tables — Spark 4's ANSI
mode throws on division by zero where DuckDB yields NULL, global
aggregates go NULL, and broadcast-side-only predicates get pushed into
1-row frames, so "works at every SF" does not imply "works at zero
rows". The r7 sweep caught five real landmines at once (the shared
ghost-range guard's assert_true(NULL) under predicate pushdown, and
export_envelope's 0-company division); this test keeps the whole
surface covered as the registry grows.

Streaming specs are excluded: an empty availableNow drain raising "no
batches" is their documented contract (same carve-out as the staged
sweep). pagerank rejects an empty edge set BY CONTRACT (ValueError,
pytest-pinned in test_properties) — expected raises are listed, not
skipped.
"""

from __future__ import annotations

import pytest


def test_registered_batch_specs_survive_empty_tables(
    spark, sf_dir, tmp_path, monkeypatch
):
    import pyarrow.parquet as pq

    from pac_spark.operators import scale
    from pac_spark.plans.registry import all_specs

    for name in (
        "events orders lineitem customer nation region supplier part "
        "documents embeddings"
    ).split():
        pq.write_table(
            pq.read_table(f"{sf_dir}/{name}.parquet").slice(0, 0),
            tmp_path / f"{name}.parquet",
        )
    # derived layouts (bucketed/compacted/zorder) build under tmp, so
    # the sweep never writes empty-tagged junk into the repo warehouse
    monkeypatch.setattr(scale, "_REPO_ROOT", str(tmp_path))

    expected_raise = {
        # documented contract: an empty graph has no stationary
        # distribution — the operator refuses rather than guessing
        "pagerank_trade_graph": ValueError,
    }
    failures: list[str] = []
    for spec in all_specs():
        if spec.name.startswith("streaming_"):
            continue
        try:
            spec.fn(spark, str(tmp_path)).collect()
        except Exception as e:  # noqa: BLE001 — collecting a report
            if not isinstance(e, expected_raise.get(spec.name, ())):
                failures.append(f"{spec.name}: {type(e).__name__}: {e}"[:300])
        else:
            if spec.name in expected_raise:
                failures.append(
                    f"{spec.name}: expected {expected_raise[spec.name]} "
                    "on empty input but it returned"
                )
    assert not failures, "\n".join(failures)


def test_empty_sweep_covers_every_batch_spec():
    """The sweep above iterates all_specs() live, so this guard only
    has to pin that batch specs dominate the registry — if the
    streaming carve-out ever eats the registry, the sweep is vacuous."""
    from pac_spark.plans.registry import all_specs

    names = [s.name for s in all_specs()]
    batch = [n for n in names if not n.startswith("streaming_")]
    assert len(batch) >= 100


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


def test_staged_batch_specs_survive_empty_tables(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The same ANSI landmine sweep over the STAGED surface — staged
    operators wait a full round before the registry gate covers them,
    and the r11 probe caught exactly one live landmine there
    (cf_holdout_coverage's coverage division with a zero-row holdout).
    collect(), never count(): count() prunes the projection and
    masked that error."""
    import pyarrow.parquet as pq

    from pac_spark.operators import scale
    from pac_spark.plans.audit import _staged_fns

    for name in (
        "events orders lineitem customer nation region supplier part "
        "documents embeddings"
    ).split():
        pq.write_table(
            pq.read_table(f"{sf_dir}/{name}.parquet").slice(0, 0),
            tmp_path / f"{name}.parquet",
        )
    monkeypatch.setattr(scale, "_REPO_ROOT", str(tmp_path))

    expected_raise = {
        # documented contract: an empty collection has no dominant
        # direction — refuse rather than guess (the pagerank stance)
        "pca_top_component": ValueError,
        # same stance: no edges, no singular pair
        "hits_hub_authority": ValueError,
    }
    failures: list[str] = []
    for name, fn in _staged_fns().items():
        try:
            fn(spark, str(tmp_path)).collect()
        except Exception as e:  # noqa: BLE001 — collecting a report
            if not isinstance(e, expected_raise.get(name, ())):
                failures.append(f"{name}: {type(e).__name__}: {e}"[:300])
        else:
            if name in expected_raise:
                failures.append(
                    f"{name}: expected {expected_raise[name]} on empty"
                    " input but it returned"
                )
    assert not failures, "\n".join(failures)
