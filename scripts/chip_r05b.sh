#!/usr/bin/env bash
# Round-5 chip session, part 2: reruns with the fixes learned from part 1
# (VQ-encode chunking, shared w8a8 build, in-jit A/B), plus the
# VERDICT r5 #6 gate-validity experiment: a 2k-step partial-epoch
# campaign-D proxy, re-scoring the promoted text knobs in a regime where
# confidence is NOT saturated.
set -uo pipefail
cd "$(dirname "$0")/.."

CKPT=proxy-output-d/export
CFG=proxy-output-d/config.yaml
PDIR=proxy-output-partial
LOG=chip_r05b.log

stage() {
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

# 1) the outage-lost artifacts, now with the OOM fixes
stage 3000 mmu_gate  python tools/mmu_truth_gate.py ckpt="$CKPT" config="$CFG" n=32 out=MMU_GATE_r05.json
stage 2400 composed  python tools/bench_mmu_ref.py arms=composed reps=3 out=MMU_REF_r05.json
# 2) attention A/B with the dispatch overhead amortized
stage 1500 attn_ab   python tools/bench_attn_interleave.py reps=5 iters=32 out=ATTN_INTERLEAVE_r05.json
# 3) partial-epoch proxy: train 2k steps, export, re-score promoted knobs
stage 1500 p_train   python train.py config=configs/proxy_campaign_d.yaml \
  experiment.output_dir="$PDIR" experiment.name=proxy-160m-campaign-d-2k \
  training.max_train_steps=2000
stage 600  p_export  python tools/export_checkpoint.py config=configs/proxy_campaign_d.yaml \
  checkpoint_dir="$PDIR" out_dir="$PDIR/export"
if [ ! -f "$PDIR/config.yaml" ]; then
  cp "$CFG" "$PDIR/config.yaml"   # already-resolved copy from the full run
fi
# artifact names deliberately do NOT match the bench pickers' *_r*.json
# globs — these score instrument validity, not promotions
stage 2400 p_kv      python tools/kv_refresh_sweep.py ckpt="$PDIR/export" config="$PDIR/config.yaml" out=GATE_PARTIAL_KV_REFRESH.json
stage 1800 p_warm    python tools/parallel_sweep.py warmup=1 ckpt="$PDIR/export" config="$PDIR/config.yaml" out=GATE_PARTIAL_PARALLEL_WARMUP.json

echo "=== [$(date +%H:%M:%S)] chip_r05b pipeline complete" | tee -a "$LOG"
