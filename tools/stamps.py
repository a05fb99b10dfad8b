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
  python tools/stamps.py --emit q161,q185   # print _ROTATE_FIRST verbatim

Output: per-query last-stamp round and age (current round = max round
seen + 1, i.e. "the window being planned"), the obligated lead set,
unstamped rows (registered but never in any window), and a window
feasibility check (obligated + unstamped <= 50).

``--emit`` takes the round's CHANGED-KERNEL list (comma-separated names
or unambiguous q-number prefixes — the one input that cannot be derived
from artifacts) and prints the 50-slot ``_ROTATE_FIRST`` tuple per the
standing order — changed kernels, then never-stamped (registration
order), then oldest-stamp-first (stamp round asc, registration order) —
ready to paste into queries.py, so the allocation is generated, not
hand-transcribed (r08 verdict item 1).
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


def emit_rotation(changed: list[str]) -> None:
    """Print the next window's ``_ROTATE_FIRST`` tuple per the standing
    order.  ``changed`` = this round's changed-kernel query names."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last, max_round = stamp_table(root)
    names = [s.name for s in q.specs()]
    resolved: list[str] = []
    for c in changed:
        hits = [n for n in names if n == c or n.startswith(c + "_") or n.startswith(c)]
        exact = [n for n in hits if n == c]
        if exact:
            resolved.append(exact[0])
        elif len(hits) == 1:
            resolved.append(hits[0])
        else:
            raise SystemExit(f"changed-kernel name {c!r} ambiguous/unknown: {hits}")
    unstamped = [n for n in names if n not in last and n not in resolved]
    rest = sorted(
        (n for n in names if n not in resolved and n in last),
        key=lambda n: (last[n], names.index(n)),
    )
    if len(resolved) + len(unstamped) > WINDOW:
        # never slice silently: dropping never-stamped rows from the tuple
        # would violate the standing rule that new registrations ride the
        # NEXT window, and the header's 'N oldest' count would go negative
        raise SystemExit(
            f"window overflow: {len(resolved)} changed + {len(unstamped)} "
            f"never-stamped > {WINDOW} slots — split the changed-kernel "
            "list across rounds (never-stamped rows cannot be deferred)"
        )
    window = (resolved + unstamped + rest)[:WINDOW]
    obligated = {n for n in names if n in last and max_round - last[n] >= 2}
    spill = sorted(obligated - set(window))
    print(f"# window for round {max_round + 1}: {len(resolved)} changed + "
          f"{len(unstamped)} never-stamped + "
          f"{WINDOW - len(resolved) - len(unstamped)} oldest "
          f"({len(spill)} age>=2 obligated rows spill to the round after)")
    print("_ROTATE_FIRST: tuple[str, ...] = (")
    cursor = 0
    for n in window:
        if cursor == 0 and resolved:
            print("    # --- changed kernel this round")
        if cursor == len(resolved) and unstamped:
            print("    # --- never stamped (registration order)")
        if cursor == len(resolved) + len(unstamped):
            print("    # --- oldest stamped rows (stamp round asc, registration order)")
        stamp = f"  # r{last[n]:02d}" if n in last else ""
        print(f'    "{n}",{stamp}')
        cursor += 1
    print(")")


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--emit":
        emit_rotation([c.strip() for c in sys.argv[2].split(",") if c.strip()])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--emit":
        emit_rotation([])
        return
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
