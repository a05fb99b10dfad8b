"""Cross-round bench comparison, normalized by the pinned machine kernels.

``bench.py`` times pinned code-independent probes (codegen_scan,
shuffle_agg, arrow_roundtrip; + regex_agg since r14) precisely so that round-over-round query
ratios can be separated into machine drift vs plan change.  This tool
does that arithmetic: given two bench JSONs (either raw ``bench.py``
stdout lines or the driver's ``BENCH_r{N}.json`` wrappers, which nest
the payload under ``parsed``), it prints per-query raw ratios, the
per-kernel drift factors, and drift-normalized ratios — a query whose
normalized ratio sits near 1.0 regressed with the machine, not the plan.

Normalization picks the kernel matching each query's dominant cost:
``arrow_roundtrip`` for the mapInPandas families, ``shuffle_agg``
otherwise (every headline query is join/aggregate-shaped); pure-codegen
scans are rare enough in the headline that codegen_scan is reported but
not auto-applied.  The assignment is a heuristic for READING runs, not
a grading input — both raw and normalized numbers print side by side,
and runs older than round 6 carry no machine_factor block, in which
case only raw ratios print.

Run: ``python tools/bench_compare.py BENCH_r05.json BENCH_r06.json``
(or any file whose single JSON object is/wraps a bench payload).
"""

from __future__ import annotations

import json
import sys

#: queries whose wall is dominated by Arrow/Python batch transfer rather
#: than JVM join/aggregate work — normalized by arrow_roundtrip
ARROW_BOUND = {"q31_multimodal_features"}

#: text-retrieval rows normalized against the r14 regex_agg probe
#: (explode+regex profile) when both payloads carry it — these are the
#: rows whose raw walls drift with string-kernel clock behavior the
#: older three probes don't capture; against pre-r14 payloads they fall
#: back to shuffle_agg
STRING_BOUND = {
    "q133_bm25_retrieval",
    "q134_hybrid_rrf_retrieval",
    "q141_bigram_lm_quality",
    "q164_pmi_collocations",
}


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' block — not a bench payload")
    return d


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    mfa, mfb = a.get("machine_factor"), b.get("machine_factor")
    drift: dict[str, float] = {}
    if mfa and mfb:
        drift = {k: round(mfb[k] / mfa[k], 3) for k in mfa if k in mfb}
        print(f"machine drift (B/A): {drift}")
    else:
        print("machine_factor missing on one side - raw ratios only")

    shared = [k for k in a["queries"] if k in b["queries"]]
    rows = []
    for name in shared:
        ra, rb = a["queries"][name], b["queries"][name]
        raw = rb / ra if ra else float("inf")
        if name in ARROW_BOUND:
            kernel = "arrow_roundtrip"
        elif name in STRING_BOUND and "regex_agg" in drift:
            kernel = "regex_agg"
        else:
            kernel = "shuffle_agg"
        norm = raw / drift[kernel] if drift.get(kernel) else None
        rows.append((name, ra, rb, raw, kernel, norm))
    # normalized rows sort together, worst first; rows whose kernel is
    # missing from one payload's probe block sort AFTER them by raw ratio
    # (a raw machine-drift artifact must never outrank a genuine
    # normalized regression in the worst-first read)
    rows.sort(key=lambda r: (r[5] is None, -(r[5] if r[5] is not None else r[3])))

    hdr = f"{'query':<36}{'A':>8}{'B':>8}{'raw':>7}  {'normalized (kernel)':>22}"
    print(hdr)
    for name, ra, rb, raw, kernel, norm in rows:
        ns = f"{norm:.2f}x ({kernel.split('_')[0]})" if norm is not None else "-"
        print(f"{name:<36}{ra:>8.3f}{rb:>8.3f}{raw:>6.2f}x  {ns:>22}")

    ta = sum(a["queries"][k] for k in shared)
    tb = sum(b["queries"][k] for k in shared)
    raw_t = tb / ta if ta else float("inf")
    line = f"shared-set total: {ta:.2f}s -> {tb:.2f}s = {raw_t:.2f}x raw"
    if drift.get("shuffle_agg"):
        line += f", {raw_t / drift['shuffle_agg']:.2f}x shuffle-normalized"
    print(line)


if __name__ == "__main__":
    main()
