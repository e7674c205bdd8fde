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
    """Staleness check: a name that was driver-green BEFORE the round that
    registered it belongs to a PAST round — leaving it in _NEW_THIS_ROUND
    is harmless for ordering (green sorts to the tail) but means the tuple
    was not refreshed, so the next round's genuinely-new names would
    quietly jump ahead of the older backlog. The registering round's own
    CORRECTNESS artifact (and later ones) are excluded: the driver writes
    CORRECTNESS_r{N}.json *after* round N's final commit, so this round's
    names turning green there is the expected outcome, not staleness —
    rounds 8 and 9 proved the unqualified check can never pass at judging
    time. Fail loudly only on the real failure mode: a tuple left stale
    across a driver write from an EARLIER round."""
    mod = _entry()
    stale = set(mod._NEW_THIS_ROUND) & mod._driver_green_names(
        max_round=mod._THIS_ROUND_NO
    )
    assert not stale, (
        f"stale _NEW_THIS_ROUND entries (driver-green before round"
        f" {mod._THIS_ROUND_NO}): {sorted(stale)}"
        " — refresh the tuple to list only THIS round's registrations"
    )


def test_staleness_check_survives_post_commit_driver_write(tmp_path):
    """Simulate the exact sequence that tripped rounds 8 and 9: the driver
    writes CORRECTNESS_r{N}.json (all of round N's registrations green)
    AFTER the builder's last commit. The staleness set must stay empty for
    max_round=N (same-round green is not staleness) while an artifact from
    round N-1 containing the same names must still trip it."""
    import json

    mod = _entry()
    names = ["fake_query_a", "fake_query_b"]
    green_rows = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True}
        for n in names
    }

    # Post-commit driver write for the registering round: not stale.
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps(green_rows))
    assert mod._driver_green_names(max_round=10, root=str(tmp_path)) == set()
    # Unqualified view still sees them (rotation ordering uses this).
    assert mod._driver_green_names(root=str(tmp_path)) == set(names)

    # A green row from an EARLIER round is the real failure mode.
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps(green_rows))
    assert mod._driver_green_names(max_round=10, root=str(tmp_path)) == set(
        names
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
