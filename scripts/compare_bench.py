#!/usr/bin/env python3
"""Like-for-like round-over-round bench comparison.

Compares two BENCH_FULL.json artifacts per query (min-over-passes vs
min-over-passes — the same statistic on both sides; the r8 verdict
flagged comparisons that mixed measurement harnesses). Prints a summary
plus the worst movers in both directions, and the per-pass totals of
each artifact so warm-up spread is visible next to the steady-state
comparison.

Usage: python3 scripts/compare_bench.py <old.json> <new.json> [top_n]
"""
import json
import statistics
import sys


def main(old_path: str, new_path: str, top_n: int = 8) -> None:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    ratios = {q: nq[q] / oq[q] for q in shared if oq[q] > 0}
    tot_old = sum(oq[q] for q in shared)
    tot_new = sum(nq[q] for q in shared)
    if not ratios or tot_old <= 0:
        sys.exit(f"no comparable shared queries between {old_path} and "
                 f"{new_path} ({len(shared)} shared, old shared total "
                 f"{tot_old:.1f}s) — nothing to compare")
    med = statistics.median(ratios.values())
    print(f"shared queries: {len(shared)}  "
          f"(old-only: {len(set(oq) - set(nq))}, new-only: {len(set(nq) - set(oq))})")
    print(f"median per-query ratio (new/old): {med:.3f}")
    print(f"shared-total: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.3f}x)")
    n_slower = sum(1 for r in ratios.values() if r > 1.25)
    n_faster = sum(1 for r in ratios.values() if r < 0.8)
    print(f"queries >1.25x slower: {n_slower}; >1.25x faster: {n_faster}")
    print(f"old pass totals: {old.get('pass_totals')}")
    print(f"new pass totals: {new.get('pass_totals')}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:top_n]
    best = sorted(ratios.items(), key=lambda kv: kv[1])[:top_n]
    print("\nworst movers (new/old, old_s -> new_s):")
    for q, r in worst:
        print(f"  {q:32s} {r:5.2f}x  {oq[q]:6.2f} -> {nq[q]:6.2f}")
    print("best movers:")
    for q, r in best:
        print(f"  {q:32s} {r:5.2f}x  {oq[q]:6.2f} -> {nq[q]:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 8)
