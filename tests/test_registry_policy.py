"""The registry's demotion policy, enforced (VERDICT r3 #1): any spec
past the driver's verification cap ships driver-unverified this round,
so the tail may only hold queries that were hash-green in TWO
CONSECUTIVE driver rounds. This test replays the CORRECTNESS_r*.json
history against the current ordering, turning the written policy
(registry.all_specs docstring) into an invariant that fails the build
the moment a reorder or new spec pushes an under-verified query past
the cap.
"""

from __future__ import annotations

import glob
import json
import os

from pac_spark.plans.registry import DRIVER_CAP, all_specs

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _green(path: str) -> set[str]:
    """Driver hash-greens ONLY. Early rounds also recorded
    ``err=no_oracle`` rows-only passes; counting those let a spec with
    a single career hash-green ride the tail (VERDICT r5 wrong-#1:
    approx_distinct_parts). Every registered spec now carries a full
    value-hash oracle, so the weaker evidence no longer counts."""
    with open(path) as f:
        rows = json.load(f)
    return {name for name, r in rows.items() if r.get("hash_match")}


def test_tail_specs_have_two_consecutive_driver_greens():
    files = sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")))
    assert len(files) >= 2, "needs at least two driver rounds of history"
    greens = [_green(f) for f in files]
    tail = [s.name for s in all_specs()[DRIVER_CAP:]]
    violations = [
        name
        for name in tail
        if not any(
            name in greens[i] and name in greens[i + 1]
            for i in range(len(greens) - 1)
        )
    ]
    assert not violations, (
        f"tail specs without two consecutive driver-green rounds: "
        f"{violations} — hoist them inside the first {DRIVER_CAP}"
    )


def test_registry_names_unique_and_cap_meaningful():
    names = [s.name for s in all_specs()]
    assert len(names) == len(set(names))
    assert len(names) > DRIVER_CAP, "policy test is vacuous under the cap"


def test_committed_hoist_matches_rotation_tool():
    """The hoist list in registry.all_specs is GENERATED (VERDICT r6
    next-#3): re-derive it from the CORRECTNESS_r*.json history via
    the rotation policy and require exact equality, so a hand edit,
    a forgotten refresh, or an aging spec fails the build instead of
    silently shipping a stale cap."""
    from pac_spark.plans.rotation import compute_hoist

    names = [s.name for s in all_specs()]
    want = compute_hoist(names, DRIVER_CAP, repo=_REPO)
    got = names[:DRIVER_CAP]
    assert got == want, (
        "committed hoist != rotation tool output; regenerate with "
        "`python -m pac_spark.plans.rotation`.\n"
        f"missing from cap: {sorted(set(want) - set(got))}\n"
        f"extra in cap:    {sorted(set(got) - set(want))}"
    )


def test_staged_queue_disjoint_from_registry():
    """Registering an operator must also pop it from
    rotation.STAGED_QUEUE (and vice versa) — overlap means the queue
    bookkeeping drifted; duplicates mean a paste error."""
    from pac_spark.plans.rotation import STAGED_QUEUE

    assert len(STAGED_QUEUE) == len(set(STAGED_QUEUE))
    overlap = set(STAGED_QUEUE) & {s.name for s in all_specs()}
    assert not overlap, f"staged AND registered: {sorted(overlap)}"


def test_compute_hoist_policy_invariants(tmp_path):
    """The rotation tool's three policy tiers pinned on a synthetic
    history: under-evidenced specs are always in (new = zero greens,
    non-consecutive greens too), forced specs ride along, and the
    remaining slots go stalest-first with alphabetical ties."""
    import json as _json

    from pac_spark.plans.rotation import compute_hoist

    hist = {
        1: {"a": True, "b": True, "c": True, "d": True, "e": False},
        2: {"a": True, "b": True, "c": False, "d": True, "e": True},
        3: {"a": True, "b": False, "c": True, "d": False, "e": False},
    }
    for rnd, rows in hist.items():
        (tmp_path / f"CORRECTNESS_r0{rnd}.json").write_text(
            _json.dumps(
                {n: {"hash_match": g} for n, g in rows.items()}
            )
        )
    # careers: a=[1,2,3] b=[1,2] c=[1,3] d=[1,2] e=[2]; f brand-new
    names = ["f", "e", "d", "c", "b", "a"]
    got = compute_hoist(names, cap=4, repo=str(tmp_path), force=())
    # mandatory: c (non-consecutive), e (single green), f (no green)
    assert got[:3] == ["c", "e", "f"]
    # fill: stalest last-green first → b (r2) before a (r3)
    assert got[3] == "b"

    # forced spec claims a slot ahead of the staleness fill
    forced = compute_hoist(names, cap=4, repo=str(tmp_path), force=("a",))
    assert forced == ["c", "e", "f", "a"]

    # a forced name that is already mandatory is not double-counted
    same = compute_hoist(names, cap=4, repo=str(tmp_path), force=("c",))
    assert same == got

    # cap smaller than the mandatory set must refuse, not truncate
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compute_hoist(names, cap=2, repo=str(tmp_path), force=())
    with _pytest.raises(ValueError):
        compute_hoist(names, cap=6, repo=str(tmp_path), force=("nope",))
