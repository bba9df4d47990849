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
    # The window (canonical names) is min(CAP, registry) wide: pending
    # names fill it first; once the backlog shrinks below the cap the
    # spare slots re-serve least-recently-verified greens (re-cert fill),
    # so the window never shrinks while green history exists.
    tiers = entry._compute_tiers()
    window = [n for n, d in tiers.items() if n == d]
    n_window = min(CAP, len(tiers))
    assert len(window) == n_window
    first = qs[:n_window]
    assert all(not n.startswith(("y_", "z")) for n in first)
    assert set(first) == set(window)
    # every windowed name must carry a hard hash-checkable oracle
    assert all(n in oracles for n in first)
    # nothing may be left waiting (y_) unless the window is full of
    # pending names already
    n_waiting = sum(1 for n in qs if n.startswith("y_"))
    if n_waiting:
        green_first, _, rows_only, _ = entry._read_correctness_history()
        n_pending_in_window = sum(
            1 for n in window if n not in green_first and n not in rows_only
        )
        assert n_pending_in_window == CAP
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


def test_recert_fill_when_backlog_fits(tmp_path):
    """Once every query is green, the window must NOT shrink: spare slots
    re-serve the least-recently-verified greens as canonical names, so
    each driver round keeps hash-checking a full window and old proofs
    are continuously revalidated."""
    names = sorted(registry.all_queries())
    half = len(names) // 2
    row = {"rows_match": True, "schema_match": True, "hash_match": True,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r97.json").write_text(
        json.dumps({n: row for n in names[:half]})
    )
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({n: row for n in names})
    )
    tiers = entry._compute_tiers(str(tmp_path))
    window = [n for n, d in tiers.items() if n == d]
    assert len(window) == CAP, "window must stay full via re-cert fill"
    # With everyone re-greened in r98, last-green ties and fill is by
    # name. Make one name STALE (green only in r97): it must lead the
    # fill, because staleness outranks name order.
    stale = names[0]
    hist = {n: row for n in names if n != stale}
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(hist))
    tiers = entry._compute_tiers(str(tmp_path))
    window = [n for n, d in tiers.items() if n == d]
    assert stale in window, "least-recently-verified green must re-serve"
    # everything outside the window is a green z-tier, never y_
    assert all(
        tiers[n].startswith("z") for n in names if n not in window
    )


def test_regression_red_repins_a_green_query(tmp_path):
    """A red row NEWER than a query's last green is a regression: the
    query must return to the pending pool (canonical window name), not
    stay comfortably rotated out behind its old green row."""
    names = sorted(registry.all_queries())
    victim = names[7]
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    red = {"rows_match": True, "schema_match": True, "hash_match": False,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r97.json").write_text(
        json.dumps({n: green for n in names})
    )
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps({victim: red}))
    tiers = entry._compute_tiers(str(tmp_path))
    assert tiers[victim] == victim, "regressed query must re-enter window"
    # and a FRESH green in a later round rotates it back out
    (tmp_path / "CORRECTNESS_r99.json").write_text(
        json.dumps({victim: green})
    )
    tiers = entry._compute_tiers(str(tmp_path))
    window = [n for n, d in tiers.items() if n == d]
    # still full via re-cert, but the victim is no longer FORCED in —
    # its last green (r99) is now the freshest, so it fills last
    assert len(window) == CAP
    assert tiers[victim].startswith("z97_") or tiers[victim] == victim


def test_regressed_green_outside_window_waits_as_y(tmp_path):
    """ADVICE r6 #1: a regressed green that does NOT win a window slot
    must surface as y_ (waiting), never as zN_ (verified) — the zN_ label
    would present a known-regressed query to the driver as green."""
    names = sorted(registry.all_queries())
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    red = {"rows_match": True, "schema_match": True, "hash_match": False,
           "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r97.json").write_text(
        json.dumps({n: green for n in names})
    )
    # regress MORE greens than the window can hold
    regressed = names[: CAP + 10]
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({n: red for n in regressed})
    )
    tiers = entry._compute_tiers(str(tmp_path))
    window = {n for n, d in tiers.items() if n == d}
    overflow = [n for n in regressed if n not in window]
    assert overflow, "test needs regressed names beyond the cap"
    for n in overflow:
        assert tiers[n] == f"y_{n}", (
            f"{n} is regressed but labeled {tiers[n]!r}; a regressed "
            "green outside the window must wait as y_, not pose as zN_"
        )


def test_rows_or_schema_mismatch_counts_as_red(tmp_path):
    """ADVICE r6 #3: a correctness row recording a row-count or schema
    mismatch WITHOUT a hash verdict (hash_match null, err null) is still
    a red and must re-pin the query into the window."""
    names = sorted(registry.all_queries())
    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    (tmp_path / "CORRECTNESS_r97.json").write_text(
        json.dumps({n: green for n in names})
    )
    rows_red = {"rows_match": False, "schema_match": None,
                "hash_match": None, "spark_rows": 3, "oracle_rows": 5,
                "err": None}
    schema_red = {"rows_match": True, "schema_match": False,
                  "hash_match": None, "spark_rows": 5, "oracle_rows": 5,
                  "err": None}
    v_rows, v_schema = names[3], names[4]
    (tmp_path / "CORRECTNESS_r98.json").write_text(
        json.dumps({v_rows: rows_red, v_schema: schema_red})
    )
    tiers = entry._compute_tiers(str(tmp_path))
    assert tiers[v_rows] == v_rows, "rows_match=false must re-pin"
    assert tiers[v_schema] == v_schema, "schema_match=false must re-pin"
