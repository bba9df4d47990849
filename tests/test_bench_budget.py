"""The bench stdout line must ALWAYS fit the driver's 2000-char tail
window and parse standalone, however many queries the headline set grows
to (round 5's capture went "parsed": null when the full map outgrew it)."""

from __future__ import annotations

import json

import bench


def _line(n_queries: int) -> str:
    timings = {
        f"q{i}_some_longish_operator_name": (i % 97) / 9.7 + 0.01
        for i in range(n_queries)
    }
    memo = {
        "memo:trigrams": 1.9,
        "memo:pairs": 3.7,
        "memo:clusters": 2.7,
        "memo:truth": 8.5,
    }
    return bench.budgeted_stdout_line(
        timings, memo, round(sum(timings.values()), 3), 0.1
    )


def test_line_fits_and_parses_at_every_scale():
    for n in (0, 1, 50, 146, 195, 400, 1000):
        line = _line(n)
        assert len(line) <= bench.STDOUT_BUDGET, (n, len(line))
        d = json.loads(line)
        assert d["n_queries"] == n
        assert d["n_listed"] == len(d["queries"]) <= n
        assert d["unit"] == "sec"


def test_suspect_list_capped_within_budget():
    timings = {
        f"q{i}_some_longish_operator_name": (i % 97) / 9.7 + 0.01
        for i in range(400)
    }
    suspects = list(timings)  # pathological: every query suspect
    line = bench.budgeted_stdout_line(
        timings, {}, 1.0, 0.1, n_rescued=400, suspects=suspects
    )
    assert len(line) <= bench.STDOUT_BUDGET
    d = json.loads(line)
    assert d["n_suspect"] == 400
    assert len(d["suspect"]) <= 12


def test_slowest_queries_listed_first():
    d = json.loads(_line(400))
    # the listed subset must be the globally slowest ones: every listed
    # time >= every omitted time (times here are distinct enough per id)
    listed = set(d["queries"])
    all_t = {
        f"q{i}": (i % 97) / 9.7 + 0.01 for i in range(400)
    }
    slowest_listed = min(all_t[q] for q in listed)
    fastest_omitted = max(
        (t for q, t in all_t.items() if q not in listed), default=0.0
    )
    assert slowest_listed >= fastest_omitted - 1e-9
    assert d["value"] == round(sum(all_t.values()), 3)
