"""Compare one or more bench-run payloads against the BASELINES ledger.

Reads the full-fidelity stderr/results payload(s) of bench.py runs and
prints, per query: baseline, each run's reading, each ratio, and the
min-ratio — flagging re-calibration candidates (every run ≥15% BELOW
baseline, VERDICT r10 #2) and regression suspects (min-ratio >1.5×).

Usage: python tools/bench_compare.py payload1.json [payload2.json ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BASELINES, ESTABLISHED, FRESH_ROTATION  # noqa: E402


def main() -> None:
    runs = []
    for p in sys.argv[1:]:
        with open(p) as fh:
            runs.append(json.load(fh))
    if not runs:
        print("usage: bench_compare.py payload.json [...]", file=sys.stderr)
        raise SystemExit(2)
    names = list(runs[0]["queries"])
    down, up = [], []
    hdr = "query".ljust(40) + "base " + " ".join(
        f"r{i+1}(ratio)".rjust(13) for i in range(len(runs))
    )
    print(hdr)
    for n in names:
        b = BASELINES.get(n)
        if b is None:
            continue
        vals = [r["queries"].get(n) for r in runs]
        ratios = [v / b if v is not None else None for v in vals]
        cells = " ".join(
            f"{v:5.2f}({rt:4.2f})".rjust(13) if v is not None else " " * 13
            for v, rt in zip(vals, ratios)
        )
        mark = ""
        ok = [rt for rt in ratios if rt is not None]
        if ok and all(rt <= 0.85 for rt in ok) and len(ok) >= 2:
            mark = "  << RECAL-DOWN"
            down.append((n, b, min(ok)))
        elif ok and min(ok) > 1.5 and n in ESTABLISHED:
            mark = "  << HOT (min>1.5x)"
            up.append((n, b, min(ok)))
        fresh = " [fresh]" if n in FRESH_ROTATION else ""
        print(f"{n:<40}{b:5.2f}{cells}{mark}{fresh}")
    for r, run in enumerate(runs, 1):
        print(
            f"run {r}: established_ratio={run.get('established_subtotal_ratio')} "
            f"fresh_ratio={run.get('fresh_subtotal_ratio')} "
            f"proxy={run.get('load_proxy_end_over_mid')} "
            f"rereads={run.get('reread_mid_sec')}"
        )
    print("\nre-calibration candidates (all runs <=0.85x):")
    for n, b, m in down:
        print(f"  {n}: baseline {b} -> min read {round(b * m, 3)} ({m:.2f}x)")
    print("regression suspects (min >1.5x):")
    for n, b, m in up:
        print(f"  {n}: baseline {b}, min ratio {m:.2f}x")


if __name__ == "__main__":
    main()
