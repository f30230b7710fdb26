#!/bin/bash
# Queued TPU measurements (BASELINE.md round-3 session 3) in one go.
# Run only when the tunnel is back; writes per-step logs to $OUT.
# Leaves the working tree exactly as it found it (patch applied and
# reverted around step B).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/queued_tpu}
mkdir -p "$OUT"

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$OUT/summary.log"
  timeout 2400 "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name exit $rc" | tee -a "$OUT/summary.log"
}

# A. headline reconfirm (trainer refactor + native decode in tree)
run bench_baseline python bench.py

# B. merged l/r gather A/B (same bench, patched tree)
if git apply --check tools/patches/merged_gather.patch 2>/dev/null; then
  git apply tools/patches/merged_gather.patch
  run bench_merged_gather python bench.py
  git apply -R tools/patches/merged_gather.patch
else
  echo "merged_gather.patch does not apply -- skipped" \
    | tee -a "$OUT/summary.log"
fi

# C. L=40 memory levers: selective remat vs gradient accumulation
run bench_l40 python tools/bench_l40.py

# D. serving path with the native host decoder
run bench_serving python tools/bench_serving.py

echo "ALL DONE ($(date))" | tee -a "$OUT/summary.log"
