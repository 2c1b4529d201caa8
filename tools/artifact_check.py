#!/usr/bin/env python3
"""End-of-round artifact self-check (VERDICT r14 item 7).

Validates that the per-round machine artifacts parse and agree with the
docs BEFORE they are committed, so process regressions (r13's refused
bench, stale counts) are caught in-round instead of by the judge:

  1. BENCH_FULL.json parses; carries clean/queries/n_ok/value.
  2. Every BENCH_HISTORY.jsonl line parses.
  3. The latest BENCH_r{N}.json / CORRECTNESS_r{N}.json parse;
     correctness rows are all-green (rows+schema+hash, no err).
  4. SCALE_GATE.json parses.
  5. README.md's "N named queries" == COVERAGE.md's "Totals: N
     registered queries" (the registry size itself is pinned to these
     by EntrySpec; this check catches editing one doc but not the other
     without a test run).
  6. Per-round parity ritual: PARITY_SWEEPS.jsonl has green full
     sweeps (sf0.01, sf0.1, manifest-stamped alt seed) at the current
     code fingerprint, and SCALE.md quotes them.
  7. Dirty-bench binding: a clean:false BENCH_FULL must be backed by a
     clean same-registry BENCH_HISTORY profile whose epoch SCALE.md
     stamps.
  8. ADVICE.md file:line citations resolve in the working tree or in
     the tree of the commit that last touched ADVICE.md (warn only).

Hard failures exit 1; warnings print but exit 0.
Usage: python3 tools/artifact_check.py [repo_root]
"""
import glob
import json
import os
import re
import sys

root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))
fails, warns = [], []
hist_path = os.path.join(root, "BENCH_HISTORY.jsonl")


def latest(pattern):
    paths = glob.glob(os.path.join(root, pattern))
    if not paths:
        return None
    def n(p):
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1
    return max(paths, key=n)


# 1. BENCH_FULL.json
bf = os.path.join(root, "BENCH_FULL.json")
if os.path.exists(bf):
    try:
        d = json.load(open(bf))
        for k in ("clean", "queries", "n_ok", "value"):
            if k not in d:
                fails.append(f"BENCH_FULL.json missing key {k!r}")
        if d.get("errors"):
            warns.append(f"BENCH_FULL.json has errors: {sorted(d['errors'])}")
        if not d.get("clean", False):
            # r19 (VERDICT r18 item 4): a dirty committed round bench must
            # be BACKED by a clean full profile of the same registry —
            # same sf, same n_ok, post-split schema — in BENCH_HISTORY,
            # and SCALE.md's latest round section must stamp that
            # profile's epoch so the binding is auditable. (History lines
            # carry no code fingerprint; same-sf + same-n_ok + an explicit
            # epoch stamp is the enforceable approximation, and the stamp
            # makes the claimed clean profile a named, checkable artifact
            # instead of prose.)
            warns.append("BENCH_FULL.json is stamped clean:false")
            try:
                cand = []
                if os.path.exists(hist_path):
                    for line in open(hist_path):
                        if not line.strip():
                            continue
                        h = json.loads(line)
                        if (h.get("clean") and "only" not in h
                                and h.get("sf") == d.get("sf")
                                and h.get("n_ok") == d.get("n_ok")
                                and h.get("schema_version", 0) >= 4):
                            cand.append(h)
                if not cand:
                    fails.append(
                        "BENCH_FULL.json is clean:false and BENCH_HISTORY has "
                        "no clean full profile with the same sf and n_ok — "
                        "collect a clean profile before closing the round")
                else:
                    sm_txt2 = open(os.path.join(root, "SCALE.md"),
                                   encoding="utf-8").read()
                    secs2 = re.split(r"^## ", sm_txt2, flags=re.M)
                    last2 = [x for x in secs2 if re.match(r"Round-\d+", x)][-1]
                    stamped = [h for h in cand
                               if f"epoch {h.get('epoch')}" in last2]
                    if not stamped:
                        fails.append(
                            "BENCH_FULL.json is clean:false: SCALE.md's latest "
                            "round section must stamp the epoch of the clean "
                            "backing profile (write 'epoch <E>' citing one of "
                            f"{[h.get('epoch') for h in cand[-3:]]})")
            except Exception as e:
                fails.append(f"dirty-bench backing check failed: {e}")
        if d.get("suspect"):
            warns.append(f"BENCH_FULL.json suspect timings: {d['suspect']}")
        # Prefer the stamp's own window-aware verdict (r16: tiny windows
        # are quantization noise and never gate); fall back to a raw max
        # for pre-r16 artifacts that lack the steal_high field.
        steals = [s for s in d.get("steal_pct", []) if s >= 0]
        steal_max = d.get("steal_max_pct", 0.5)
        steal_high = d.get("steal_high",
                           bool(steals and max(steals) > steal_max))
        if steal_high:
            warns.append(
                f"BENCH_FULL.json recorded high hypervisor steal "
                f"{d['steal_pct']} (gate {steal_max}%) — discount timings")
        bench_n_ok = d.get("n_ok")
    except Exception as e:
        fails.append(f"BENCH_FULL.json unparseable: {e}")
        bench_n_ok = None
else:
    warns.append("BENCH_FULL.json absent")
    bench_n_ok = None

# 2. BENCH_HISTORY.jsonl
if os.path.exists(hist_path):
    for i, line in enumerate(open(hist_path), 1):
        if line.strip():
            try:
                json.loads(line)
            except Exception as e:
                fails.append(f"BENCH_HISTORY.jsonl line {i} unparseable: {e}")

# 3. latest per-round artifacts
br = latest("BENCH_r*.json")
if br:
    try:
        json.load(open(br))
    except Exception as e:
        fails.append(f"{os.path.basename(br)} unparseable: {e}")
cr = latest("CORRECTNESS_r*.json")
if cr:
    try:
        rows = json.load(open(cr))
        bad = [q for q, r in rows.items()
               if not (r.get("rows_match") and r.get("schema_match")
                       and r.get("hash_match")) or r.get("err")]
        if bad:
            warns.append(
                f"{os.path.basename(cr)}: {len(bad)} non-green rows "
                f"(e.g. {sorted(bad)[:5]})")
    except Exception as e:
        fails.append(f"{os.path.basename(cr)} unparseable: {e}")

# 4. SCALE_GATE.json, and SCALE.md's quoted agg must match it (the
# round-15 drift: SCALE.md said 1.757x while the committed gate said
# 1.877x — same pattern as the README/COVERAGE count guard).
sg = os.path.join(root, "SCALE_GATE.json")
if os.path.exists(sg):
    try:
        gate = json.load(open(sg))
        if not gate.get("pass", False):
            warns.append(f"SCALE_GATE.json pass=false: {gate.get('failures')}")
        sm = os.path.join(root, "SCALE.md")
        if os.path.exists(sm) and "agg_ratio" in gate:
            quoted = re.findall(r"agg ratio \*\*([\d.]+)×\*\*",
                                open(sm, encoding="utf-8").read())
            if not quoted:
                fails.append("SCALE.md has no 'agg ratio **N×**' line to "
                             "cross-check against SCALE_GATE.json")
            elif abs(float(quoted[-1]) - gate["agg_ratio"]) > 0.0005:
                fails.append(
                    f"SCALE.md quotes agg ratio {quoted[-1]}x but "
                    f"SCALE_GATE.json says {gate['agg_ratio']}x — sync them")
    except Exception as e:
        fails.append(f"SCALE_GATE.json unparseable: {e}")

# 4b. scale-gate TREND guard (VERDICT r16 item 3): each run passes the
# 3.0 gate in isolation while the clean agg ratio drifted 1.445x (r14)
# -> 1.757/1.877x (r15) -> 1.784x (r16) with nothing watching the slope.
# Diff the working-tree SCALE_GATE.json against the last committed one:
# warn when agg_ratio rises > 0.3 on a comparable entry set (>= 80%
# query overlap — a deliberate mix change legitimately moves the
# aggregate and should be acknowledged in SCALE.md instead), and
# per-query when a shared non-exempt entry's ratio more than doubles.
if os.path.exists(sg):
    try:
        import subprocess
        prev_txt = subprocess.run(
            ["git", "-C", root, "show", "HEAD:SCALE_GATE.json"],
            capture_output=True, text=True).stdout
        cur = json.load(open(sg))
        prev = json.loads(prev_txt) if prev_txt.strip() else None
        if prev and "agg_ratio" in prev and "agg_ratio" in cur:
            pq, cq = set(prev.get("queries", {})), set(cur.get("queries", {}))
            shared = pq & cq
            comparable = pq and cq and \
                len(shared) >= 0.8 * max(len(pq), len(cq))
            rise = cur["agg_ratio"] - prev["agg_ratio"]
            if comparable and rise > 0.3:
                warns.append(
                    f"SCALE_GATE agg_ratio rose {prev['agg_ratio']}x -> "
                    f"{cur['agg_ratio']}x (+{rise:.3f}) on a comparable "
                    f"query set — investigate or acknowledge in SCALE.md")
            for q in sorted(shared):
                p, c = prev["queries"][q], cur["queries"][q]
                if (not c.get("exempt") and p.get("ratio", 0) > 0
                        and c.get("ratio", 0) > 2 * p["ratio"]
                        and c.get("ratio", 0) >= 1.0):
                    warns.append(
                        f"SCALE_GATE {q} ratio doubled: {p['ratio']}x -> "
                        f"{c['ratio']}x")
    except Exception as e:
        warns.append(f"scale-gate trend check skipped: {e}")

# 5. doc-count agreement
try:
    readme = open(os.path.join(root, "README.md"), encoding="utf-8").read()
    coverage = open(os.path.join(root, "COVERAGE.md"), encoding="utf-8").read()
    rm = re.search(r"(\d+) named queries", readme)
    cm = re.search(r"Totals: (\d+) registered queries", coverage)
    if not rm or not cm:
        fails.append("count line missing in README.md or COVERAGE.md")
    elif rm.group(1) != cm.group(1):
        fails.append(f"README says {rm.group(1)} queries, "
                     f"COVERAGE says {cm.group(1)}")
    elif bench_n_ok is not None and bench_n_ok != int(rm.group(1)):
        warns.append(f"BENCH_FULL n_ok={bench_n_ok} != documented "
                     f"{rm.group(1)} (stale profile after a query add?)")
except Exception as e:
    fails.append(f"doc-count check failed: {e}")

# 6. per-round parity ritual (VERDICT r17 item 6): the round close must
# carry full parity_sweep.sh certifications — sf0.01, sf0.1, and >= 1
# alternate-seed fixture — recorded in PARITY_SWEEPS.jsonl by the sweep
# script itself, keyed by a fingerprint of the src/main + tools state
# (index blobs + unstaged diff + untracked status; commit-invariant).
# A code change after the sweeps invalidates them HARD: re-run the three
# sweeps. SCALE.md's latest round section must also quote three n/n
# sweep lines so the human-readable record matches the ledger.
try:
    import subprocess

    def _run(args):
        return subprocess.run(["git", "-C", root] + args,
                              capture_output=True, text=True).stdout

    import hashlib
    blob = (_run(["ls-files", "-s", "--", "src/main", "tools"])
            + _run(["diff", "--", "src/main", "tools"])
            + _run(["status", "--porcelain", "--", "src/main", "tools"]))
    fp = hashlib.sha1(blob.encode()).hexdigest()[:16]
    ledger_path = os.path.join(root, "PARITY_SWEEPS.jsonl")
    entries = []
    if os.path.exists(ledger_path):
        for line in open(ledger_path):
            if line.strip():
                entries.append(json.loads(line))
    mine = [e for e in entries if e.get("src_fp") == fp
            and e.get("green") == e.get("total") and e.get("total", 0) > 0]
    swept_dirs = {e["sf"].rstrip("/") for e in mine}
    have_001 = any(d.endswith("sf0.01") for d in swept_dirs)
    have_01 = any(d.endswith("sf0.1") for d in swept_dirs)
    # Alternate-seed certification is keyed on the Perturb manifest's
    # seed recorded by parity_sweep.sh (ADVICE r18) — a renamed copy of
    # a standard fixture no longer counts. Pre-r19 ledger entries have
    # no seed field and do not satisfy the requirement (sweeps re-run
    # every round at the final code state anyway).
    have_alt = any(e.get("seed") is not None
                   for e in mine)
    if not (have_001 and have_01 and have_alt):
        fails.append(
            f"parity ritual incomplete for current code state (src_fp={fp}): "
            f"green full sweeps found for {sorted(swept_dirs) or 'none'} — "
            f"need sf0.01, sf0.1, and an alternate-seed dir "
            f"(run bash tools/parity_sweep.sh for each)")
    sm_txt = open(os.path.join(root, "SCALE.md"), encoding="utf-8").read()
    secs = re.split(r"^## ", sm_txt, flags=re.M)
    last_round = [s for s in secs if re.match(r"Round-\d+", s)][-1]
    sweep_lines = re.findall(r"parity_sweep[^\n]*?(\d+)/(\d+) green",
                             last_round)
    ok_lines = [(a, b) for a, b in sweep_lines if a == b]
    if len(ok_lines) < 3:
        fails.append(
            f"SCALE.md's latest round section quotes {len(ok_lines)} green "
            f"parity_sweep lines — must quote >= 3 (sf0.01, sf0.1, alt seed)")
except Exception as e:
    fails.append(f"parity-ritual check failed: {e}")

# 8. ADVICE.md citations — resolved against the tree the advisor SAW
# (the commit that last touched ADVICE.md), not the drifting working
# tree (r19, VERDICT r18 item 6): a citation is only flagged when it
# does not resolve in EITHER tree.
adv = os.path.join(root, "ADVICE.md")
if os.path.exists(adv):
    try:
        import subprocess
        adv_commit = subprocess.run(
            ["git", "-C", root, "log", "-1", "--format=%H", "--", "ADVICE.md"],
            capture_output=True, text=True).stdout.strip()
    except Exception:
        adv_commit = ""

    def _lines_at_commit(path):
        if not adv_commit:
            return None
        try:
            import subprocess
            r = subprocess.run(
                ["git", "-C", root, "show", f"{adv_commit}:{path}"],
                capture_output=True, text=True)
            return r.stdout.count("\n") if r.returncode == 0 else None
        except Exception:
            return None

    for m in re.finditer(r"(src/[\w/.]+\.scala):(\d+)",
                         open(adv, encoding="utf-8").read()):
        p, ln = m.group(1), int(m.group(2))
        fp = os.path.join(root, p)
        wt_ok = os.path.exists(fp) and \
            sum(1 for _ in open(fp, encoding="utf-8")) >= ln
        if wt_ok:
            continue
        at = _lines_at_commit(p)
        if at is not None and at >= ln:
            continue  # resolves in the tree the advisor wrote against
        if not os.path.exists(fp) and at is None:
            warns.append(f"ADVICE cites missing file {p}")
        else:
            warns.append(f"ADVICE cites {p}:{ln} beyond EOF in both the "
                         "working tree and the ADVICE commit's tree")

for w in warns:
    print(f"WARN  {w}")
for f in fails:
    print(f"FAIL  {f}")
print(f"artifact_check: {len(fails)} failure(s), {len(warns)} warning(s)")
sys.exit(1 if fails else 0)
