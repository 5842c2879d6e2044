"""r5 verdict #2: the CORRECTNESS window must self-refresh — a newly
registered query (no driver verdict in any CORRECTNESS_r*.json) has to
sort into the driver's 50-slot window with NO manual PRIORITY edit."""

from __future__ import annotations

import json

import os

from iceberg_evaluation_spark.plans import _registry
from iceberg_evaluation_spark.plans.registry import (
    derive_priority,
    load_correctness_history,
)

WINDOW = 50  # the driver checks only the first 50 of queries()
# the repo root of THIS checkout — not a hardcoded path, so a foreign
# checkout never reads some other repository's CORRECTNESS history
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_new_query_sorts_into_window_without_manual_edit():
    names = [f"q{i:03d}_x" for i in range(1, 112)] + ["q999_brand_new"]
    history = {n: 2 + (i % 4) for i, n in enumerate(names[:111])}
    order = derive_priority(names, history, pinned_head=["q001_x"])
    assert order[0] == "q001_x"  # pinned head wins
    assert order[1] == "q999_brand_new"  # never-checked right behind
    assert order.index("q999_brand_new") < WINDOW


def test_staleness_orders_oldest_verdict_first():
    names = ["a", "b", "c", "d"]
    order = derive_priority(names, {"a": 5, "b": 2, "c": 2, "d": 4})
    # no never-checked: pure staleness, registration order tie-break
    assert order == ["b", "c", "d", "a"]


def test_pinned_names_missing_from_registry_are_dropped():
    order = derive_priority(["a", "b"], {"a": 1}, pinned_head=["ghost", "b"])
    assert order == ["b", "a"]


def test_live_registry_window_covers_all_unverdicted(tmp_path):
    """At HEAD: every registered query with no driver verdict sits inside
    the first 50 of all_queries(), and nothing in the registry still
    carries a pre-r3 latest verdict outside the window."""
    from iceberg_evaluation_spark.plans import all_queries

    names = list(all_queries())
    window = set(names[:WINDOW])
    history = load_correctness_history(REPO_ROOT)
    if not history:  # foreign checkout without CORRECTNESS files
        return
    for n in names:
        if n not in history:
            assert n in window, f"{n} never driver-checked but outside window"
        elif history[n] < 3:
            assert n in window, f"{n} verdict from r{history[n]} gone stale"


def test_future_registration_lands_in_window(tmp_path):
    """Register a synthetic query against the REAL history: it must sort
    into the window with no PRIORITY edit (the automation contract)."""
    history = load_correctness_history(REPO_ROOT)
    names = list(_registry.REGISTRY) + ["q998_added_next_round"]
    order = derive_priority(names, history, pinned_head=["q01_pricing_summary"])
    assert order.index("q998_added_next_round") < WINDOW


def test_corrupt_history_file_is_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"qx": {}}))
    assert load_correctness_history(str(tmp_path)) == {"qx": 2}


def test_freshness_sla_pin_budget_and_no_overaged_verdicts():
    """r7 verdict #4, made mechanical: the hand-pinned head stays within
    the <=10 budget, and no query whose latest driver verdict is older
    than (latest round - 2) is left OUTSIDE the 50-slot window — the
    steady-state 'no verdict older than 3 rounds' SLA."""
    from iceberg_evaluation_spark.plans import all_queries

    assert len(_registry.PINNED_HEAD) <= 10, (
        f"pin budget exceeded ({len(_registry.PINNED_HEAD)}): every pin "
        "past 10 silently ages the window's tail"
    )
    history = load_correctness_history(REPO_ROOT)
    if not history:
        return  # foreign checkout without CORRECTNESS artifacts
    latest = max(history.values())
    names = list(all_queries())
    outside = names[WINDOW:]
    overaged = sorted(
        n for n in outside if history.get(n, latest) <= latest - 2
    )
    assert not overaged, (
        f"{len(overaged)} queries with verdicts older than r{latest - 1} "
        f"left outside the window: {overaged[:8]}..."
    )
