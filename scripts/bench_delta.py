"""Per-query bench comparison: BENCH_DETAIL.json (current) vs a previous
round's BENCH_r{N}.json (driver capture, short query ids).

Usage: python scripts/bench_delta.py [BENCH_rN.json] [ratio_threshold]
Prints total drift and every query at/above the threshold (default 1.25).
Exit code 1 if any mover ≥ 2× (a real regression, not host noise).
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    prev_path = sys.argv[1] if len(sys.argv) > 1 else None
    if prev_path is None:
        rounds = sorted(
            f for f in os.listdir(HERE)
            if f.startswith("BENCH_r") and f.endswith(".json")
        )
        if not rounds:
            print("no BENCH_r*.json found")
            return 0
        prev_path = os.path.join(HERE, rounds[-1])
    thresh = float(sys.argv[2]) if len(sys.argv) > 2 else 1.25

    cur_full = json.load(open(os.path.join(HERE, "BENCH_DETAIL.json")))["queries"]
    cur = {k.split("_")[0]: v for k, v in cur_full.items()}
    prev_doc = json.load(open(prev_path))
    prev = (prev_doc.get("parsed") or prev_doc).get("queries", {})
    if not prev and "tail" in prev_doc:
        # tail-truncated capture (BENCH_r05 era): recover per-query pairs
        # from the raw tail text — the map entries are intact even when
        # the JSON line's head was cut off
        import re

        prev = {
            m.group(1): float(m.group(2))
            for m in re.finditer(
                r'\\?"(q\w+?)\\?":([0-9.]+)', prev_doc["tail"]
            )
        }
        prev.pop("queries", None)
    common = [k for k in cur if k in prev and prev[k] > 0]
    tp, tc = sum(prev[k] for k in common), sum(cur[k] for k in common)
    print(
        f"{os.path.basename(prev_path)} -> BENCH_DETAIL: {len(common)} common, "
        f"{tp:.1f}s -> {tc:.1f}s ({tc / tp:.2f}x)"
    )
    hard = 0
    for k in sorted(common, key=lambda k: -(cur[k] / prev[k])):
        r = cur[k] / prev[k]
        if r >= thresh and prev[k] > 0.15:
            flag = " <-- REGRESSION" if r >= 2 else ""
            print(f"  {r:5.2f}x  {k:8s} {prev[k]:6.2f} -> {cur[k]:6.2f}{flag}")
            hard += r >= 2
    new = sorted(set(cur) - set(prev))
    if new:
        print("new:", ", ".join(f"{k}={cur[k]:.2f}" for k in new))
    return 1 if hard else 0


if __name__ == "__main__":
    sys.exit(main())
