"""Driver-stamp ledger: which round last verified each registered query,
and who is obligated to lead the next round's 50-slot window.

The driver value-hash-checks only the FIRST 50 entries of ``queries()``
per round (ordering = ``_ROTATE_FIRST`` in queries.py), so every row
carries an implicit stamp age: rounds since its last appearance in a
CORRECTNESS_r{N}.json.  The standing rotation rule (VERDICT r4/r5):
age 2 is the staleness bound — rows at age 2 MUST be rotated into the
next window, after any kernels changed in the round itself.  Until now
that bookkeeping lived in hand-maintained comment blocks; this tool
derives it from the artifacts, so the allocation can be checked (or
written) mechanically:

  python tools/stamps.py            # ledger + next-window obligation

Output: per-query last-stamp round and age (current round = max round
seen + 1, i.e. "the window being planned"), the obligated lead set,
unstamped rows (registered but never in any window), and a window
feasibility check (obligated + unstamped <= 50).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_hadoop_automation_in_cloud_spark import queries as q

WINDOW = 50


def stamp_table(root: str) -> tuple[dict[str, int], int]:
    """name -> last round whose CORRECTNESS file contains it tri-green."""
    last: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        max_round = max(max_round, rnd)
        with open(path) as f:
            data = json.load(f)
        for name, res in data.items():
            ok = (
                isinstance(res, dict)
                and res.get("rows_match")
                and res.get("schema_match")
                # rows-only oracles have no hash; absent key counts as pass
                and res.get("hash_match", True)
                and not res.get("err")
            )
            if ok:
                last[name] = max(last.get(name, 0), rnd)
    return last, max_round


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last, max_round = stamp_table(root)
    planning = max_round + 1  # the window being planned next
    names = [s.name for s in q.specs()]

    # age convention (matches the VERDICT ledgers): rounds elapsed since
    # the last stamp AS OF the latest completed round — an r03 stamp after
    # round 5 completes is age 2 (the bound), and must appear in round 6's
    # window.
    rows = []
    for name in names:
        stamped = last.get(name)
        age = None if stamped is None else max_round - stamped
        rows.append((name, stamped, age))

    unstamped = [n for n, s, _ in rows if s is None]
    obligated = sorted(n for n, s, a in rows if a is not None and a >= 2)
    fresh = sorted(n for n, s, a in rows if a == 1)

    print(
        f"rounds seen: 1..{max_round}; planning window for the NEXT driver "
        f"run (nominally round {planning} — a build round whose driver "
        "verification never produced a CORRECTNESS file, like round 6, "
        "does not advance this ledger: ages are rounds-since-last-STAMP, "
        "not wall-clock rounds)"
    )
    print(f"registered queries: {len(names)}")
    print(
        f"\nunstamped (never in any driver window — ride the next window's "
        f"'new' block) [{len(unstamped)}]:"
    )
    for n in unstamped:
        print(f"  {n}")
    print(
        f"\nage >= 2 (the bound) — MUST lead round {planning}'s window "
        f"[{len(obligated)}]:"
    )
    for n in obligated:
        print(f"  {n} (last r{last[n]:02d})")
    lead = len(unstamped) + len(obligated)
    print(
        f"\nwindow feasibility: {len(unstamped)} unstamped + "
        f"{len(obligated)} obligated = {lead} of {WINDOW} slots"
        + (
            " — OVERFLOW, split across rounds"
            if lead > WINDOW
            else " (remaining slots: round-changed kernels first, then "
            "age-1 refreshes)"
        )
    )
    print(
        f"age 1 (stamped r{max_round - 1:02d}, reach the bound during round "
        f"{planning} -> must lead round {planning + 1}): {len(fresh)} rows"
    )


if __name__ == "__main__":
    main()
