#!/usr/bin/env python3
"""Decade-slope analysis over two Bench boards (dev tooling).

Usage: python3 tools/slopes.py <sf1_board.json> <sf10_board.json> [anchor]

Joins the per-query times of two full-board runs (typically sf1 and
sf10 from the same session), computes the raw slope sf10/sf1 per query,
normalizes by the anchor's slope (default q07_tpch_q1 — JIT/page-cache
session composition swings absolute slopes ~3x, so only anchor-relative
readings are comparable across sessions), and prints a markdown table
sorted by normalized slope descending, flagging rows whose normalized
slope exceeds the linear bound (1.0 = exactly the anchor's drift).
"""
import json
import sys


def board(path):
    d = json.load(open(path))
    qs = d.get("queries") or d.get("queries_slowest")
    return {k: v for k, v in qs.items() if v and v > 0}


def main():
    b1, b10 = board(sys.argv[1]), board(sys.argv[2])
    anchor = sys.argv[3] if len(sys.argv) > 3 else "q07_tpch_q1"
    if anchor not in b1 or anchor not in b10:
        sys.exit(f"anchor {anchor} missing from a board "
                 f"(excluded or failed run) — pass another anchor")
    a = b10[anchor] / b1[anchor]
    shared = sorted(set(b1) & set(b10))
    rows = []
    for q in shared:
        slope = b10[q] / b1[q]
        rows.append((q, b1[q], b10[q], slope, slope / a))
    rows.sort(key=lambda r: -r[4])
    print(f"anchor {anchor}: x{a:.2f}/decade "
          f"({b1[anchor]:.2f} -> {b10[anchor]:.2f} s)")
    print("| Query | sf1 s | sf10 s | x(1->10) | vs anchor |")
    print("|---|---|---|---|---|")
    for q, t1, t10, s, n in rows:
        flag = " **" if n > 1.15 else ""
        print(f"| {q}{flag} | {t1:.2f} | {t10:.2f} | {s:.2f} | {n:.2f} |")
    over = [r for r in rows if r[4] > 1.15]
    print(f"\n{len(shared)} shared queries; {len(over)} above 1.15x anchor "
          f"(adjudicate or fix each)")


if __name__ == "__main__":
    main()
