"""Registry-freshness report: latest driver-green round per query.

Reads every CORRECTNESS_r*.json beside the repo root and joins it
against the CURRENT registry (``__spark_entry__.queries()``), printing:

- the histogram of latest-green rounds (the rotation-debt summary the
  verdict tracks),
- the oldest cohort in registration order (the candidates for the next
  round's ``_WINDOW_HEAD``),
- any registered query with NO driver row in any round (must be a new
  registration sitting inside the current 50-query window),
- any failing row in the newest CORRECTNESS file.

Usage: python tools/freshness.py [--oldest N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def green(row: dict) -> bool:
    # rows-only entries (err == 'no_oracle') have every match field
    # None; the driver's weaker check is "ran and produced >= 0 rows".
    # These are NOT folded silently into green: main() reports them in
    # a distinct "rows-only" section (ADVICE r8 — a rows-only query
    # that regresses to wrong VALUES can never fail here, so the
    # weaker check must stay visible instead of reading as verified).
    if row.get("err") == "no_oracle":
        return row.get("spark_rows") is not None
    return bool(row.get("hash_match"))


def rows_only(row: dict) -> bool:
    return row.get("err") == "no_oracle"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--oldest", type=int, default=40)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    weak: dict[str, int] = {}  # latest green round that was rows-only
    newest_round, newest_doc = 0, {}
    for path in sorted(glob.glob(f"{root}/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        doc = json.load(open(path))
        if rnd > newest_round:
            newest_round, newest_doc = rnd, doc
        for name, row in doc.items():
            if green(row):
                latest[name] = max(latest.get(name, 0), rnd)
                if rows_only(row):
                    weak[name] = max(weak.get(name, 0), rnd)

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    hist = Counter(latest.get(n, 0) for n in names)
    print(f"registered: {len(names)}")
    print("latest-green histogram (0 = never driver-checked):")
    for rnd in sorted(hist):
        print(f"  r{rnd}: {hist[rnd]}")

    window = set(names[:50])
    never = [n for n in names if n not in latest]
    uncovered = [n for n in never if n not in window]
    if never:
        print(f"never driver-checked ({len(never)}): {never}")
    if uncovered:
        print(
            f"WARNING: never-checked AND outside the 50-window: {uncovered}"
        )
    # rows-only rows pass a strictly weaker check (ran + produced rows;
    # values never compared) — surface them instead of folding into
    # green (ADVICE r8)
    weak_now = [n for n in names if weak.get(n) == latest.get(n, 0)]
    if weak_now:
        print(
            f"rows-only (no oracle — VALUES NEVER DRIVER-CHECKED, "
            f"{len(weak_now)}): {weak_now}"
        )

    print(f"\noldest {args.oldest} in registration order (r{newest_round} file"
          " is the newest):")
    ranked = sorted(names, key=lambda n: (latest.get(n, 0), names.index(n)))
    for n in ranked[: args.oldest]:
        print(f"  r{latest.get(n, 0)}  {n}")

    fails = [n for n, row in newest_doc.items() if not green(row)]
    weak_newest = [
        n for n, row in newest_doc.items() if green(row) and rows_only(row)
    ]
    if fails:
        print(f"\nFAILING in CORRECTNESS_r{newest_round:02d}: {fails}")
        return 1
    suffix = (
        f" ({len(weak_newest)} rows-only: {weak_newest})" if weak_newest else ""
    )
    print(
        f"\nCORRECTNESS_r{newest_round:02d}: all {len(newest_doc)} "
        f"green{suffix}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
