#!/usr/bin/env bash
# One-command cross-scale parity sweep (VERDICT r16 item 4).
#
# Runs graft.Verify (every registered query -> parquet dump + the
# oracle_sql.json) at an ARBITRARY sf dir, then tools/parity.py (the
# DuckDB oracle mirror) over the dump, and exits with parity.py's
# status. This is the diagnostic that caught three latent cross-engine
# rounding-tie bug classes in round 16 — tie bugs need a specific row
# value to fire, so they hide below the driver's sf0.01 gate; run this
# at sf0.1 (and any perturbed fixture) once per round and record the
# result in SCALE.md.
#
# Usage: bash tools/parity_sweep.sh [sfDir] [outDir] [keyRegex]
#   sfDir    default /root/testdata/sf0.1
#   outDir   default /tmp/graft-parity-<basename sfDir>
#   keyRegex optional anchored regex restricting the swept queries
set -euo pipefail
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/graft-parity-$(basename "$SF")}
REGEX=${3:-}
cd "$(dirname "$0")/.."
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT $REGEX" 2>&1 |
  grep -E '\[verify\]|\[success\]|\[error\].*(Exception|error:)' || true
python3 tools/parity.py "$SF" "$OUT"
