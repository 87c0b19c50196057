#!/usr/bin/env python3
"""Per-query bench drift check between two rounds.

Loads the detailed per-query timings from two bench outputs (either a
BENCH_r{N}.json driver capture, whose JSON line is embedded in its "tail"
field, or a raw bench_out.json written by graft.Bench) and prints the
per-query time ratio current/previous for every query present in both.

Exits non-zero when any shared query regressed more than --max-ratio
(default 1.3x) unless the query name is listed via --allow (for
regressions that have a SURVEY-documented reason).

Usage:
  python3 tools/bench_compare.py BENCH_r07.json bench_out.json
  python3 tools/bench_compare.py --max-ratio 1.3 --allow q_foo,q_bar prev.json cur.json
"""
import argparse
import json
import re
import sys


def load_queries(path):
    """Return {query: seconds} from either a driver BENCH_r*.json (tail
    field holds the printed JSON line) or a raw bench_out.json."""
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict) and "queries" in data:
        return dict(data["queries"])
    if isinstance(data, dict) and "tail" in data:
        # driver capture: the tail holds the bench's printed JSON line(s),
        # possibly truncated at the front — scrape every "q_name": seconds
        # pair; later occurrences (the final summary line) win
        out = {}
        for m in re.finditer(r'"(q_[A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)',
                             data["tail"]):
            out[m.group(1)] = float(m.group(2))
        if out:
            return out
    raise SystemExit(f"{path}: no per-query timings found")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("--max-ratio", type=float, default=1.3)
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="ignore regressions where both sides are below this "
                         "(sub-200ms timings are timer noise)")
    ap.add_argument("--allow", default="",
                    help="comma-separated query names allowed to regress")
    args = ap.parse_args()

    prev = load_queries(args.prev)
    cur = load_queries(args.cur)
    allow = {q for q in args.allow.split(",") if q}

    shared = sorted(set(prev) & set(cur))
    only_prev = sorted(set(prev) - set(cur))
    only_cur = sorted(set(cur) - set(prev))

    rows = []
    for q in shared:
        p, c = prev[q], cur[q]
        ratio = c / p if p > 0 else float("inf")
        rows.append((ratio, q, p, c))
    rows.sort(reverse=True)

    bad = []
    print(f"{'query':34s} {'prev':>8s} {'cur':>8s} {'ratio':>7s}")
    for ratio, q, p, c in rows:
        flag = ""
        if ratio > args.max_ratio and max(p, c) >= args.min_sec:
            if q in allow:
                flag = "  ALLOWED"
            else:
                flag = "  REGRESSION"
                bad.append((q, p, c, ratio))
        print(f"{q:34s} {p:8.3f} {c:8.3f} {ratio:6.2f}x{flag}")

    tp, tc = sum(prev[q] for q in shared), sum(cur[q] for q in shared)
    print(f"\nshared total: {tp:.1f}s -> {tc:.1f}s "
          f"({tc / tp if tp else 0:.2f}x) over {len(shared)} queries")
    if only_prev:
        print(f"dropped since prev: {', '.join(only_prev)}")
    if only_cur:
        print(f"new this round: {', '.join(only_cur)}")

    if bad:
        print(f"\nFAIL: {len(bad)} quer{'y' if len(bad) == 1 else 'ies'} "
              f"regressed beyond {args.max_ratio}x:")
        for q, p, c, ratio in bad:
            print(f"  {q}: {p:.3f}s -> {c:.3f}s ({ratio:.2f}x)")
        sys.exit(1)
    print("OK: no per-query regression beyond "
          f"{args.max_ratio}x (min-sec {args.min_sec})")


if __name__ == "__main__":
    main()
