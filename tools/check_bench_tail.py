"""Self-check for the bench tail-capture contract (round-4 verdict item 1).

The driver records only the last ~2000 characters of bench.py stdout.
Round 4's only judging defect was that window landing inside a trailing
"first_run" (cold) dict and being misread as steady-state timings.
bench.py now emits the steady-state "queries" dict LAST; this tool
replays the driver's capture against a recorded BENCH_r*.json (or a raw
bench stdout line) and verifies the tail window:

  1. ends exactly at the close of the "queries" dict,
  2. contains no cold-run dict,
  3. yields parseable steady-state (name, seconds) pairs — reported so a
     human can see how much of the catalog the window preserves.

Usage: python tools/check_bench_tail.py [BENCH_rNN.json ...]
With no args, checks every BENCH_r*.json in the repo root and flags the
pre-round-5 files as KNOWN-BAD (they predate the ordering fix).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

TAIL = 2000


def check_line(line: str, label: str) -> bool:
    line = line.strip()
    tail = line[-TAIL:]
    ok = True
    if '"first_run"' in tail:
        print(f"{label}: FAIL — cold 'first_run' dict inside the {TAIL}-char tail")
        ok = False
    if not line.endswith("}}") or '"queries"' not in line:
        print(f"{label}: FAIL — line does not close with the queries dict")
        ok = False
    try:
        parsed = json.loads(line)
        if list(parsed)[-1] != "queries":
            # round 4's exact defect shape: a trailing dict (cold runs)
            # AFTER queries pushes steady-state out of the tail window —
            # and if the window opens past that dict's key name, the
            # tail alone cannot tell cold from steady-state
            print(f"{label}: FAIL — 'queries' must be the LAST key on the line")
            ok = False
    except json.JSONDecodeError:
        pass  # driver tail files are partial lines; tail checks cover them
    # Recover (query, sec) pairs from the tail exactly as a tail-only
    # reader would: everything after the LAST '"queries": {' marker if
    # present, else every pair in the window (the window may open
    # mid-dict for large catalogs).
    marker = tail.rfind('"queries": {')
    region = tail[marker:] if marker >= 0 else tail
    pairs = re.findall(r'"([A-Za-z0-9_]+)": ([0-9]+\.[0-9]+)', region)
    pairs = [(k, float(v)) for k, v in pairs if k not in ("sf", "startup_sec")]
    if not pairs:
        print(f"{label}: FAIL — no steady-state timings recoverable from tail")
        ok = False
    if ok:
        try:
            full = json.loads(line)
            n_total = len(full.get("queries", {}))
            recovered = {k for k, _ in pairs}
            n_match = sum(1 for k in full.get("queries", {}) if k in recovered)
            print(
                f"{label}: OK — tail ends in steady-state queries; "
                f"{n_match}/{n_total} timings inside the {TAIL}-char window"
            )
        except json.JSONDecodeError:
            print(f"{label}: OK (tail contract) — full line not valid JSON standalone")
    return ok


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    rc = 0
    for p in paths:
        with open(p) as fh:
            text = fh.read().strip()
        # driver files may wrap the line; take the last JSON-looking line
        line = [l for l in text.splitlines() if l.strip().startswith("{")][-1]
        base = os.path.basename(p)
        known_bad = re.match(r"BENCH_r0[1-4]\.json$", base) is not None
        good = check_line(line, base)
        if not good and known_bad:
            print(f"  ({base} predates the round-5 ordering fix — expected)")
        elif not good:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
