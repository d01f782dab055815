#!/usr/bin/env python3
"""Reduce scripts/ab_interleaved.sh output into per-query A/B medians,
spread, and a drift verdict.

For every query and side: median + min/max over the interleaved
sweeps. The noise bound is the per-side relative spread
((max-min)/median); a ratio B/A is flagged REAL only when the two
sides' interquartile-ish ranges do not overlap — i.e. the delta
exceeds the measured noise, the r14 verdict's "no unexplained >1.25x
delta on untouched queries" criterion made mechanical.

usage: ab_aggregate.py <legs.jsonl> [out.json]
"""
import json
import statistics
import sys


def main() -> None:
    legs = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
    per = {}  # (query) -> side -> [times]
    for leg in legs:
        body = leg["leg"]
        qs = body.get("queries") or body.get("ops") or {}
        for q, t in qs.items():
            per.setdefault(q, {}).setdefault(leg["side"], []).append(t)
    rows = {}
    for q, sides in sorted(per.items()):
        a = sorted(sides.get("A", []))
        b = sorted(sides.get("B", []))
        if not a or not b:
            continue
        ma, mb = statistics.median(a), statistics.median(b)
        spread_a = (a[-1] - a[0]) / ma if ma else 0.0
        spread_b = (b[-1] - b[0]) / mb if mb else 0.0
        ratio = mb / ma if ma else float("inf")
        # non-overlapping ranges => the delta is outside measured noise
        real = (b[-1] < a[0]) or (b[0] > a[-1])
        rows[q] = {
            "a_median": round(ma, 3), "b_median": round(mb, 3),
            "ratio_b_over_a": round(ratio, 3),
            "a_runs": [round(x, 3) for x in a],
            "b_runs": [round(x, 3) for x in b],
            "spread_a": round(spread_a, 3), "spread_b": round(spread_b, 3),
            "outside_noise": real,
        }
    out = {
        "metric": "ab_interleaved",
        "sweeps": max((l["sweep"] for l in legs), default=0),
        "queries": rows,
    }
    dst = sys.argv[2] if len(sys.argv) > 2 else None
    text = json.dumps(out, indent=1)
    if dst:
        with open(dst, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
