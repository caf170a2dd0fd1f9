"""Regenerate rotation.py's _LAST_SAMPLED_BY_ROUND fragment.

Run at each round fold (r12 checklist #1): computes, for every query
name, the LAST round it received an external CORRECTNESS row (max over
the key sets of CORRECTNESS_r*.json), and prints the dict literal to
paste over the existing `_LAST_SAMPLED_BY_ROUND` in
naive_query_engine_spark/rotation.py.  The oldest-first resample order
is a pure function of this ledger, so regenerating it after appending
the new window to DRIVER_SAMPLED is the entire maintenance step.

Usage: python tools/regen_last_sampled.py   (prints to stdout)
"""

from __future__ import annotations

import glob
import json
import os
import textwrap

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        r = int(f.rsplit("_r", 1)[1].split(".")[0])
        for k in json.load(open(f)):
            last[k] = max(last.get(k, 0), r)
    by_round: dict[int, list[str]] = {}
    for n, r in last.items():
        by_round.setdefault(r, []).append(n)
    print("_LAST_SAMPLED_BY_ROUND: dict[int, tuple[str, ...]] = {")
    for r in sorted(by_round):
        body = ", ".join(repr(n) for n in sorted(by_round[r]))
        wrapped = textwrap.fill(
            body, width=72, initial_indent="        ",
            subsequent_indent="        ",
        )
        print(f"    {r}: (")
        print(wrapped + ",")
        print("    ),")
    print("}")


if __name__ == "__main__":
    main()
