#!/usr/bin/env python3
"""Convert a `ScaleStress sf1full` sweep log into the BENCH_sf1.json
artifact (per-query wall-clock at sf0.1 and 10x replicas + summary
stats).

r15: carries the sweep's `stored_serve`/`*_prewarm_sec` fields (stored
rows are pre-warmed so the timed run is the serve, not a cold
once-per-corpus build) and `anchor_of` labels (documented brute-force
exactness anchors name their bounded sibling in the row itself), and
counts >20x rows that are NEITHER labeled anchors NOR stored serves —
those are the actionable findings.

Usage: python3 scripts/make_bench_sf1.py <sweep.log> <round> [out.json]
"""
import json
import re
import statistics
import sys


def main(log_path: str, rnd: int, out_path: str = "BENCH_sf1.json") -> None:
    # lines process in order and the LAST row for a query wins either
    # way: a later success supersedes an earlier error AND a later error
    # supersedes a stale success (advice r8 — the old rows-dict-wins rule
    # silently kept a pre-regression success)
    rows = {}
    capped = set()
    capped_anchor = {}
    for line in open(log_path, errors="replace"):
        m = re.search(r'\{"stress":"sf1full".*\}', line)
        if not m:
            continue
        d = json.loads(m.group(0))
        q = d["query"]
        if "error" in d:
            rows.pop(q, None)
            capped.add(q)
            if "anchor_of" in d:
                capped_anchor[q] = d["anchor_of"]
        else:
            capped.discard(q)
            row = {"sf01_sec": round(d["sf01_sec"], 2),
                   "sf1_sec": round(d["sf1_sec"], 2),
                   "ratio": round(d["ratio"], 2)}
            for k in ("stored_serve", "anchor_of"):
                if k in d:
                    row[k] = d[k]
            for k in ("sf01_prewarm_sec", "sf1_prewarm_sec"):
                if k in d:
                    row[k] = round(d[k], 2)
            rows[q] = row
    capped = sorted(capped)
    ratios = sorted(v["ratio"] for v in rows.values())
    n = len(ratios)
    worst = max(rows.items(), key=lambda kv: kv[1]["ratio"]) if rows else (None, None)
    unattributed = sorted(q for q, v in rows.items()
                          if v["ratio"] > 20
                          and "anchor_of" not in v and not v.get("stored_serve"))
    art = {
        "artifact": "full-registry sf1 sweep (10x replicas of sf0.1; "
                    "per-query wall-clock at both scales)",
        "round": rnd,
        "replicas": 10,
        "methodology": "stored_serve rows are pre-warmed at each dir (one "
                       "untimed pass builds the once-per-corpus artifact when "
                       "absent; its wall-clock is the *_prewarm_sec fields) so "
                       "the timed run measures the serve; anchor_of labels mark "
                       "documented brute-force/growing-universe exactness "
                       "anchors and name the bounded sibling that carries the "
                       "same semantics at scale",
        "n_queries_swept": n + len(capped),
        "n_valid": n,
        "watchdog_capped": capped,
        "watchdog_capped_anchor_of": capped_anchor,
        "watchdog_note": "capped rows exceeded the 600s per-pass cap at 10x: "
                         "their verify mass is realized-overlap-proportional and "
                         "the 10x replica corpus is template-heavy; each carries "
                         "an anchor_of label naming the banded bounded-candidate "
                         "sibling that clears the same corpus well under the cap",
        "ratio_median": round(statistics.median(ratios), 2) if ratios else None,
        "ratio_p90": round(ratios[int(n * 0.9)], 2) if ratios else None,
        "ratio_max": worst[1]["ratio"] if rows else None,
        "ratio_max_query": worst[0],
        "n_superlinear_gt_20x": sum(1 for r in ratios if r > 20),
        "superlinear_gt_20x_unattributed": unattributed,
        "queries": dict(sorted(rows.items())),
    }
    with open(out_path, "w") as f:
        json.dump(art, f, indent=1)
    print(f"{out_path}: {n} valid rows, {len(capped)} capped, "
          f"median ratio {art['ratio_median']}, p90 {art['ratio_p90']}, "
          f"unattributed >20x: {unattributed}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         sys.argv[3] if len(sys.argv) > 3 else "BENCH_sf1.json")
