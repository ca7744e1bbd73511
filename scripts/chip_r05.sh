#!/usr/bin/env bash
# Round-5 chip session: the outage-lost round-4 evidence FIRST (VERDICT
# r5 #1), then the attention A/B (#2), fresh profile (#3), composed
# train arm (#4), the r05 gate replications, and a bench rerun.
# Discipline (CLAUDE.md): strictly sequential, per-stage `timeout`,
# incremental artifact saves inside every tool, and a quiet period after
# any killed/failed stage so a degraded tunnel can drain.
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT=proxy-output-d/export
CFG=proxy-output-d/config.yaml
LOG=chip_r05.log

stage() {  # stage <seconds> <name> <cmd...>
  local t=$1 name=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] stage $name (timeout ${t}s): $*" | tee -a "$LOG"
  if timeout "$t" "$@" >>"$LOG" 2>&1; then
    echo "=== [$(date +%H:%M:%S)] stage $name OK" | tee -a "$LOG"
  else
    local rc=$?
    echo "=== [$(date +%H:%M:%S)] stage $name FAILED rc=$rc — 240s quiet" | tee -a "$LOG"
    sleep 240
  fi
}

# 1) the round-3/4 carried-over asks
stage 3000 mmu_gate    python tools/mmu_truth_gate.py ckpt="$CKPT" config="$CFG" n=32 out=MMU_GATE_r05.json
stage 3600 mmu_ref     python tools/bench_mmu_ref.py arms=w8a8,composed reps=3 out=MMU_REF_r05.json
stage 1800 mmu_ref_kv  python tools/bench_mmu_ref.py arms=kv reps=3 out=MMU_REF_r05.json
# 2) the single-chip attention lever A/B
stage 1200 attn_ab     python tools/bench_attn_interleave.py reps=5 out=ATTN_INTERLEAVE_r05.json
# 3) fresh profile with the fixed analyzer (post-kernel-revert numbers)
stage 1500 profile     python tools/profile_w8a8.py --scheme w8a8 --out PROFILE_w8a8_r05.json
# 4) STE-w8a8 x dots-remat composed train arm
stage 2400 train_comp  python tools/bench_train.py remat=dots quantize=w8a8 out=TRAIN_BENCH_r05.json
stage 2400 train_dots  python tools/bench_train.py remat=dots out=TRAIN_BENCH_r05.json
# 5) r05 gate replications (same order as regate_proxy.sh)
stage 2400 cfg_gate    python tools/cfg_interval_sweep.py ckpt="$CKPT" config="$CFG" out=CFG_INTERVAL_r05.json
stage 2400 quant_gate  python tools/quant_gate.py ckpt="$CKPT" config="$CFG" out=QUANT_r05.json
stage 2400 kv_refresh  python tools/kv_refresh_sweep.py ckpt="$CKPT" config="$CFG" out=KV_REFRESH_r05.json
stage 1800 parallel    python tools/parallel_sweep.py ckpt="$CKPT" config="$CFG" out=PARALLEL_r05.json
stage 1800 par_warm    python tools/parallel_sweep.py warmup=1 ckpt="$CKPT" config="$CFG" out=PARALLEL_WARMUP_r05.json
stage 1800 composed    python tools/composed_fast_gate.py ckpt="$CKPT" config="$CFG" out=COMPOSED_FAST_r05.json
# 6) headline bench with every picker eligible to fire
stage 3000 bench       env BENCH_KV_T2I=1 python bench.py

echo "=== [$(date +%H:%M:%S)] chip_r05 pipeline complete" | tee -a "$LOG"
