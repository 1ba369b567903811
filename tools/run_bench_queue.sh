#!/bin/bash
# The full capture queue, in dependency order, for a machine with a healthy TPU chip.
# One chip, one process at a time (the relay serializes poorly under contention — CLAUDE.md).
# Results land in the repo root (BENCH_FAST.json, BENCH_BACKBONES.json) and /tmp logs.
#
#   bash tools/run_bench_queue.sh [LOGFILE=/tmp/bench_queue.log]
#
# Stage 2 (full-scale protocol runs: NIGHTS no-reuse, CUTE prewarm rerun, TID extreme-reuse)
# generates synthetic trees under /tmp and drives the real CLI end-to-end; see
# tools/make_{nights,cute,tid}_fullscale.py for the workload shapes.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/bench_queue.log}"

step() { echo "=== $1 $(date) ===" | tee -a "$LOG"; }

step "bench.py (flagship SD-1.5 cached-path throughput)"
timeout 2400 python bench.py 2>> "$LOG" | tee -a "$LOG"
echo "rc=${PIPESTATUS[0]}" >> "$LOG"

step "bench_fastmode (--no_cfg_parity --bf16_softmax + agreement)"
timeout 3600 python tools/bench_fastmode.py --out BENCH_FAST.json >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

step "bench_backbones (SDXL@1024 + DiT@512, per-backbone anchors)"
timeout 4800 python bench_backbones.py --out BENCH_BACKBONES.json >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

step "profile_vae_1024 (XL VAE MFU attribution)"
timeout 2400 python tools/profile_vae_1024.py >> "$LOG" 2>&1
echo "rc=$?" >> "$LOG"

step "hbm_report (guard recalibration vs XLA memory_analysis)"
for t in 8 24 48; do
  timeout 1800 python tools/hbm_report.py --t $t --img 512 >> "$LOG" 2>&1
done

step "stage 2: full-scale protocol runs"
# sentinel files, not bare [ -d ]: an interrupted generator leaves a partial tree that
# would otherwise be silently benchmarked as "full-scale" on every later run
gen() {  # gen <sentinel-dir> <generator args...>
  local dir=$1; shift
  [ -f "$dir/.complete" ] && return 0
  if python "$@" >> "$LOG" 2>&1; then touch "$dir/.complete"; else
    echo "GENERATOR FAILED: $* (rc=$?) — skipping its full-scale leg" >> "$LOG"; return 1
  fi
}
gen /tmp/nights_fullscale tools/make_nights_fullscale.py /tmp/nights_fullscale 2120 512
gen /tmp/cute_fullscale tools/make_cute_fullscale.py /tmp/cute_fullscale 512
gen /tmp/tid_fullscale tools/make_tid_fullscale.py /tmp/tid_fullscale 512
leg() {  # leg <name> <sentinel-dir> <image_path>
  local name=$1 dir=$2 path=$3
  [ -f "$dir/.complete" ] || { echo "skipping $name (no complete fixture)" >> "$LOG"; return; }
  step "full-scale $name"
  # this image has no /usr/bin/time; record wall seconds by hand
  local t0=$SECONDS
  timeout 3600 python -m diffsim_tpu.cli.main "$name" --preset "$name" \
    --image_path "$path" --batch_size 24 --results "/tmp/${name}_full_res.jsonl" >> "$LOG" 2>&1
  echo "rc=$? wall_s=$((SECONDS - t0))" >> "$LOG"
}
leg nights /tmp/nights_fullscale /tmp/nights_fullscale
leg cute /tmp/cute_fullscale /tmp/cute_fullscale/cute
leg tid /tmp/tid_fullscale /tmp/tid_fullscale

step "QUEUE DONE"
