"""Min-merge the current BENCH_DETAIL.json into BENCH_FLOOR.json.

The floor file is bench.py's spike-rescue reference: the elementwise
best-known CLEAN min per query. Run after a clean end-of-round capture.

Drift gate (round-9 ADVICE): a capture whose start/end controls drifted
outside [0.7, 1.4] is refused without --force — an anomalously fast
low-drift run would otherwise permanently lower the rescue floors and
make bench.py over-flag normal runs.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIFT_BAND = (0.7, 1.4)


def main() -> None:
    with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as f:
        cap = json.load(f)
    path = os.path.join(ROOT, "BENCH_FLOOR.json")
    with open(path) as f:
        floor = json.load(f)
    drift = cap.get("controls", {}).get("drift")
    force = "--force" in sys.argv
    if force:
        sys.argv.remove("--force")
    if drift is None or not (DRIFT_BAND[0] <= drift <= DRIFT_BAND[1]):
        if not force:
            print(
                f"REFUSED: capture drift {drift} outside {DRIFT_BAND} "
                "(pass --force to merge anyway)"
            )
            raise SystemExit(1)
        print(f"WARNING: merging despite drift {drift} (--force)")
    merged, lowered, added = dict(floor.get("queries", {})), 0, 0
    for q, v in cap["queries"].items():
        if q not in merged:
            merged[q] = v
            added += 1
        elif v < merged[q]:
            merged[q] = v
            lowered += 1
    floor["queries"] = merged
    mm = dict(floor.get("memo_builds", {}))
    for k, v in cap.get("memo_builds", {}).items():
        if k not in mm or v < mm[k]:
            mm[k] = v
    floor["memo_builds"] = mm
    prov = sys.argv[1] if len(sys.argv) > 1 else "capture"
    # bounded provenance: keep the last few merge records, not an
    # unbounded append (round-9 ADVICE)
    records = [
        r.strip() for r in floor.get("_provenance", "").split(".") if r.strip()
    ][-4:]
    records.append(f"Min-merged with {prov} (drift {drift})")
    floor["_provenance"] = ". ".join(records) + "."
    floor["controls_drift"] = drift
    with open(path, "w") as f:
        json.dump(floor, f, indent=1)
    print(f"floor: {len(merged)} queries ({lowered} lowered, {added} added)")


if __name__ == "__main__":
    main()
