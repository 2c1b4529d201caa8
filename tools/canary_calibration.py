#!/usr/bin/env python3
"""Host-speed-vector calibration over clean same-code bench profiles
(VERDICT r17 item 1).

Reads BENCH_HISTORY.jsonl, selects profiles by epoch (the known
same-code r17/r18 set passed on the command line, or all clean full
profiles carrying the 3-component vector by default), and reports:

  - raw total CV across the clean profiles (the comparator to beat);
  - per-component leave-one-out residual CV for the 1-parameter linear
    model total = a + b*component (LOO, because with n=4 profiles an
    in-sample 2-parameter fit "beating" raw CV is guaranteed and
    meaningless);
  - the quiet-band table for each component (min/max over clean
    profiles vs the readings on dirty/contended ones).

This is analysis tooling, not a gate: the promotion decision and its
rationale live in Bench.MembwMaxSec's scaladoc + SCALE.md round-18.

Usage: python3 tools/canary_calibration.py [epoch ...]
"""
import json
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
want = {int(a) for a in sys.argv[1:]}

rows = []
for line in open(os.path.join(root, "BENCH_HISTORY.jsonl")):
    if not line.strip():
        continue
    d = json.loads(line)
    if "canary_membw_sec" not in d or "only" in d:
        continue
    rows.append(d)

clean = [d for d in rows if d.get("clean")
         and (not want or d["epoch"] in want)]
dirty = [d for d in rows if not d.get("clean")]

COMPS = ["canary_sec", "canary_shuffle_sec", "canary_membw_sec"]


def cv(xs):
    n = len(xs)
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / (n - 1) if n > 1 else 0.0
    return (var ** 0.5) / m if m else float("nan")


print(f"clean same-code profiles: {len(clean)} "
      f"(epochs {[d['epoch'] for d in clean]})")
for d in clean:
    print(f"  {d['epoch']}  total {d['value']:8.2f}  " +
          "  ".join(f"{c.split('_')[1]} {d[c]:6.3f}" for c in COMPS))
tot = [d["value"] for d in clean]
print(f"\nraw total CV = {cv(tot):.4f}  (mean {sum(tot)/len(tot):.1f} s)")

# Leave-one-out residual CV per single component: fit total = a + b*c on
# n-1 points, predict the held-out one; CV of (actual - predicted)
# relative to mean total. A component only earns comparator status if
# this beats raw CV.
for comp in COMPS:
    xs = [d[comp] for d in clean]
    n = len(clean)
    if n < 3:
        print(f"{comp}: n<3, skipping")
        continue
    resid = []
    for i in range(n):
        X = [xs[j] for j in range(n) if j != i]
        Y = [tot[j] for j in range(n) if j != i]
        mx, my = sum(X) / len(X), sum(Y) / len(Y)
        sxx = sum((x - mx) ** 2 for x in X)
        b = (sum((X[k] - mx) * (Y[k] - my) for k in range(len(X))) / sxx
             if sxx > 1e-12 else 0.0)
        a = my - b * mx
        resid.append(tot[i] - (a + b * xs[i]))
    m = sum(tot) / n
    rms = (sum(r * r for r in resid) / n) ** 0.5
    print(f"LOO residual CV vs {comp:22s} = {rms / m:.4f}  "
          f"({'beats' if rms / m < cv(tot) else 'does NOT beat'} raw)")

print("\nquiet-band table (clean profiles vs dirty readings):")
for comp in COMPS + ["canary_membw_end_sec"]:
    cvals = sorted(d[comp] for d in clean if comp in d)
    dvals = sorted(d[comp] for d in dirty if comp in d)
    if cvals:
        print(f"  {comp:22s} clean [{cvals[0]:.3f}, {cvals[-1]:.3f}] "
              f"(n={len(cvals)})  dirty {dvals}")
