"""Driver correctness-window rotation: the contract surface must put this
round's priority set first, map verified queries behind the window, and —
critically — SELF-ROTATE when a future round's CORRECTNESS file lands."""

from __future__ import annotations

import json

import __spark_entry__ as entry
from spark_state_provider_spark.operators import registry

CAP = entry._WINDOW_CAP


def test_current_window_is_priority_and_ordered():
    qs = list(entry.queries().keys())
    oracles = entry.oracle_sql()
    assert qs == sorted(qs), "iteration order must equal sorted order"
    # Derive the pending count the same way the module does: the window is
    # min(CAP, pending) wide — once the backlog shrinks below the cap the
    # remainder of the sorted contract is green-prefixed, by design.
    tiers = entry._compute_tiers()
    pending = [n for n, d in tiers.items() if n == d]
    n_window = min(CAP, len(pending))
    first = qs[:n_window]
    assert all(not n.startswith(("y_", "z")) for n in first)
    # every windowed name must carry a hard hash-checkable oracle
    assert all(n in oracles for n in first)
    if len(pending) < CAP:
        # backlog fits in one window: EVERY pending name must be windowed
        # and everything after the window must be rotated-out green (z-)
        # or rows-only names — no y_ (still-waiting) names may remain.
        assert set(first) == set(pending)
        assert all(n.startswith("z") for n in qs[n_window:]), (
            "with backlog < cap nothing should be left waiting (y_)"
        )
    # prefixed names resolve back to registered canonical queries
    for n in qs:
        canon = entry._PREFIX_RE.sub("", n)
        registry.get(canon)


def test_rotation_advances_after_a_round_lands(tmp_path):
    """Simulate the driver committing CORRECTNESS_r98.json with greens for
    the current window: the next import must rotate them to z98_ and pull
    the longest-waiting pending names into the freed slots."""
    tiers_now = entry._compute_tiers(str(tmp_path))
    window_now = [n for n, d in tiers_now.items() if n == d]
    assert len(window_now) == CAP

    # driver writes green rows for exactly the current window
    fake = {
        n: {"rows_match": True, "schema_match": True, "hash_match": True,
            "spark_rows": 1, "oracle_rows": 1, "err": None}
        for n in window_now
    }
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(fake))

    tiers_next = entry._compute_tiers(str(tmp_path))
    window_next = [n for n, d in tiers_next.items() if n == d]
    # all previously-windowed names rotated behind
    for n in window_now:
        assert tiers_next[n] == f"z98_{n}"
    # freed slots filled with other pending names, oracle-bearing first
    oracles = registry.all_oracles()
    assert window_next, "window must refill"
    assert not set(window_next) & set(window_now)
    with_oracle = [n for n in window_next if n in oracles]
    assert len(with_oracle) >= min(len(window_next), 1)
    # Every registered query now carries an oracle (q28c graduated to the
    # portable 64-bit md5 simhash in round 3), so a rows-only record must
    # NOT be terminal: the query returns to the pending pool and keeps
    # competing for a hard hash row. (The z0_ terminal tier remains in the
    # code for any future genuinely-oracle-less registration.)
    assert not [n for n in registry.all_queries() if n not in oracles], (
        "registry should have no permanently-unverifiable queries"
    )
    fake2 = dict(fake)
    fake2["q28c_simhash"] = {
        "rows_match": None, "schema_match": None, "hash_match": None,
        "spark_rows": 5, "oracle_rows": None, "err": "no_oracle",
    }
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(fake2))
    tiers3 = entry._compute_tiers(str(tmp_path))
    assert not tiers3["q28c_simhash"].startswith("z"), (
        "an oracle-bearing query served only a rows-only check must stay "
        "pending, not rotate out"
    )
