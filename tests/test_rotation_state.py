"""Loud-failure guards for the driver-sample rotation state in
__spark_entry__.py (round-7 advice: hand-maintained rotation state must
fail loudly when stale instead of quietly demoting the backlog)."""

from __future__ import annotations

import importlib


def _entry():
    return importlib.import_module("__spark_entry__")


def test_new_this_round_names_exist_in_registry():
    """A typo'd registration name in _NEW_THIS_ROUND would silently do
    nothing (set membership never matches); every name must be real."""
    mod = _entry()
    from emails_to_vector_db_spark.plans import REGISTRY

    missing = [n for n in mod._NEW_THIS_ROUND if n not in REGISTRY]
    assert not missing, f"_NEW_THIS_ROUND names not in REGISTRY: {missing}"


def test_new_this_round_not_already_driver_green():
    """Staleness check: a name that is already driver-green belongs to a
    PAST round — leaving it in _NEW_THIS_ROUND is harmless for ordering
    (green sorts to the tail) but means the tuple was not refreshed, so
    the next round's genuinely-new names would quietly jump ahead of the
    older backlog. Fail loudly so the tuple gets refreshed each round."""
    mod = _entry()
    stale = set(mod._NEW_THIS_ROUND) & mod._driver_green_names()
    assert not stale, (
        f"stale _NEW_THIS_ROUND entries (already driver-green): {sorted(stale)}"
        " — refresh the tuple to list only THIS round's registrations"
    )


def test_rotation_puts_backlog_before_new_and_green():
    """Never-sampled backlog names come first, this round's registrations
    next, green names last — the property the driver's ~50-slot sample
    window depends on."""
    mod = _entry()
    green = mod._driver_green_names()
    fresh = set(mod._NEW_THIS_ROUND)
    order = mod._ordered_names()

    def cls(n: str) -> int:
        if n in green:
            return 2
        return 1 if n in fresh else 0

    classes = [cls(n) for n in order]
    assert classes == sorted(classes), "rotation order violates backlog-first"
