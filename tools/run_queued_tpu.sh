#!/bin/bash
# Queued TPU measurements (BASELINE.md round-3 session 3) in one go.
# Run only when the tunnel is back; writes per-step logs to $OUT.
# Leaves the working tree exactly as it found it (patch applied and
# reverted around step B, with an EXIT trap covering interrupts).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/queued_tpu}
mkdir -p "$OUT"

PATCH_APPLIED=0
cleanup() {
  if [ "$PATCH_APPLIED" = 1 ]; then
    git apply -R tools/patches/merged_gather.patch 2>/dev/null \
      && echo "cleanup: reverted merged_gather.patch" \
        | tee -a "$OUT/summary.log"
  fi
}
trap cleanup EXIT

run() { # name, timeout_s, cmd...
  local name=$1 cap=$2; shift 2
  echo "=== $name: $* ($(date))" | tee -a "$OUT/summary.log"
  # GNU timeout signals the command's whole process group, so python's
  # benchmark children die with it; kill-after covers children stuck in
  # the tunnel retry loop ignoring SIGTERM (they would otherwise keep
  # the chip and the 1-core host busy into the next measurement)
  timeout --kill-after=60 "$cap" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name exit $rc" | tee -a "$OUT/summary.log"
}

# A. headline reconfirm (trainer refactor + native decode in tree)
run bench_baseline 2400 python bench.py

# B. merged l/r gather A/B (same bench, patched tree)
if git apply --check tools/patches/merged_gather.patch 2>/dev/null; then
  git apply tools/patches/merged_gather.patch
  PATCH_APPLIED=1
  run bench_merged_gather 2400 python bench.py
  git apply -R tools/patches/merged_gather.patch
  PATCH_APPLIED=0
else
  echo "merged_gather.patch does not apply -- skipped" \
    | tee -a "$OUT/summary.log"
fi

# C. L=40 memory levers: selective remat vs gradient accumulation
#    (4 configs x up to 1200 s each in child processes + probe)
run bench_l40 5700 python tools/bench_l40.py

# D. serving path with the native host decoder + request micro-batching
run bench_serving 2400 python tools/bench_serving.py --concurrency 16

echo "ALL DONE ($(date))" | tee -a "$OUT/summary.log"
