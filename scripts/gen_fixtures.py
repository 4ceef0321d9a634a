#!/usr/bin/env python3
"""Generate hard-coded expected values for the ScalaTest fixtures with an
independent reimplementation of the reference algorithms (SURVEY.md §2):
average ranks with ties, tie term, U/z/p (normal approx + tie/continuity
correction, math.erfc), Benjamini-Hochberg, log fold change.
Prints Scala literals to paste into specs."""
import math

import numpy as np


def avg_ranks(v):
    v = np.asarray(v, dtype=float)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    i = 0
    sv = v[order]
    while i < len(v):
        j = i
        while j + 1 < len(v) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    if np.isnan(v).any():
        ranks[:] = np.nan
    return ranks


def tie_term(v):
    vals, cnt = np.unique(np.asarray(v, dtype=float), return_counts=True)
    cnt = cnt[~np.isnan(vals)] if np.isnan(vals).any() else cnt
    return int(sum(c**3 - c for c in cnt))


def mwu(v, groups):
    v = np.asarray(v, dtype=float)
    groups = np.asarray(groups)
    n = len(v)
    r = avg_ranks(v)
    t = tie_term(v)
    out = {}
    for g in sorted(set(groups)):
        m = groups == g
        n1 = int(m.sum())
        n2 = n - n1
        r1 = float(r[m].sum())
        u1 = r1 - n1 * (n1 + 1) / 2.0
        u2 = n1 * n2 - u1
        u = max(u1, u2)
        mu = n1 * n2 / 2.0
        sig = math.sqrt(n1 * n2 / 12.0 * ((n + 1) - t / (n * (n - 1.0))))
        z = (u - mu - 0.5) / sig if sig > 0 else float("inf") * (1 if u > mu + 0.5 else -1)
        p = min(1.0, math.erfc(z / math.sqrt(2.0))) if math.isfinite(z) else (
            0.0 if z > 0 else 1.0)
        out[g] = (n1, r1, u1, u2, sig, z, p)
    return t, out


def bh(ps):
    m = len(ps)
    order = np.argsort(ps, kind="stable")
    adj = np.empty(m)
    mn = float("inf")
    for k in range(m - 1, -1, -1):
        i = order[k]
        mn = min(mn, ps[i] * m / (k + 1))
        adj[i] = min(1.0, mn)
    return adj


def lfc(v, groups, base=None):
    k = math.log(base) if base else 1.0
    v = np.asarray(v, dtype=float)
    groups = np.asarray(groups)
    out = {}
    for g in sorted(set(groups)):
        m = groups == g
        mu1, mu2 = v[m].mean(), v[~m].mean()
        f = lambda x: math.expm1(x * k) + 1e-9
        out[g] = math.log2(f(mu1)) - math.log2(f(mu2))
    return out


def show(name, val):
    print(f"{name} = {val!r}")


# F1: explicit ties (reference tests/test_ranking.py:30-40 style)
f1 = [2, 2, 3, 2, 3, 3]
f2 = [4, 4, 4, 4, 4, 4]
g6 = ["a", "b", "a", "b", "a", "b"]
show("F1 ranks", list(avg_ranks(f1)))
show("F2 ranks", list(avg_ranks(f2)))
show("F1 tie/mwu", mwu(f1, g6))
show("F2 tie/mwu", mwu(f2, g6))

# F3: random mixed (seeded, embedded verbatim in the spec)
rng = np.random.default_rng(42)
vals = rng.integers(-50, 50, 24).tolist()
grps = [["x", "y", "z"][i % 3] for i in range(24)]
show("F3 vals", vals)
show("F3 grps", grps)
show("F3 mwu", mwu(vals, grps))

# F4: BH over the 3 group p's of F3 + a tie case
ps = sorted([mwu(vals, grps)[1][g][6] for g in "xyz"])
show("F4 ps", ps)
show("F4 bh", list(bh(np.array(ps))))
tie_ps = [0.01, 0.04, 0.04, 0.8]
show("F4 tie bh", list(bh(np.array(tie_ps))))

# F5: lfc on log1p counts, bases None/2/10
counts = [0, 1, 5, 9, 2, 7, 3, 3]
g8 = ["a", "a", "b", "b", "a", "b", "a", "b"]
for base in (None, 2, 10):
    data = [math.log1p(c) / (math.log(base) if base else 1.0) for c in counts]
    show(f"F5 lfc base={base}", lfc(data, g8, base))
