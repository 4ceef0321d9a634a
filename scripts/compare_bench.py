#!/usr/bin/env python3
"""Like-for-like round-over-round bench comparison.

Compares two BENCH_FULL.json artifacts per query (min-over-passes vs
min-over-passes — the same statistic on both sides; the r8 verdict
flagged comparisons that mixed measurement harnesses). Prints a summary
plus the worst movers in both directions, and the per-pass totals of
each artifact so warm-up spread is visible next to the steady-state
comparison.

Usage: python3 scripts/compare_bench.py <old.json> <new.json> [top_n] [--normalize]

--normalize divides host-speed drift out of the comparison using the
per-pass calibration micro-run both artifacts record (Bench.calibrate —
a frozen data-free workload): new times are scaled by
median(old calibration) / median(new calibration), so a uniformly
slower/faster host reads as ~1.0x instead of a phantom slope. Falls
back to raw comparison (with a warning) when either artifact predates
the calibration key.
"""
import json
import statistics
import sys


def main(old_path: str, new_path: str, top_n: int = 8,
         normalize: bool = False) -> None:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    if normalize:
        oc, nc = old.get("calibration"), new.get("calibration")
        if oc and nc:
            factor = statistics.median(oc) / statistics.median(nc)
            nq = {q: t * factor for q, t in nq.items()}
            print(f"host-normalized: new times scaled by {factor:.3f} "
                  f"(old calib {statistics.median(oc):.2f}s, "
                  f"new calib {statistics.median(nc):.2f}s)")
        else:
            missing = [p for p, c in ((old_path, oc), (new_path, nc)) if not c]
            print(f"WARNING: --normalize requested but no calibration key in "
                  f"{', '.join(missing)} — comparing RAW times")
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
    args = [a for a in sys.argv[1:] if a != "--normalize"]
    main(args[0], args[1], int(args[2]) if len(args) > 2 else 8,
         normalize="--normalize" in sys.argv)
