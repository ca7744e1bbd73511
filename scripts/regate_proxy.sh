#!/usr/bin/env bash
# Regenerate every trained-proxy gate artifact against the checkpoint in
# $CKPT_DIR (default proxy-output-d — the campaign-D recipe,
# configs/proxy_campaign_d.yaml). Run after (re)training the gate proxy:
#
#   python train.py config=configs/proxy_campaign_d.yaml
#   bash scripts/regate_proxy.sh [suffix]
#
# The optional suffix lands in the artifact names (e.g. `r03d2` ->
# QUANT_r03d2.json); bench.py's pickers glob `*_r*.json` sorted, so a
# later suffix supersedes earlier artifacts without erasing them.
# ONE chip process at a time: this script is strictly sequential.
set -euo pipefail
cd "$(dirname "$0")/.."

SUF="${1:-r03}"
CKPT_DIR="${CKPT_DIR:-proxy-output-d}"
CKPT="$CKPT_DIR/export"
CFG="$CKPT_DIR/config.yaml"

if [ ! -f "$CFG" ]; then
  # write a RESOLVED copy — the campaign yaml's `_base_:` is relative to
  # configs/, so a raw cp breaks every gate tool that loads it from the
  # checkpoint dir (bit the r04 pipeline)
  python - "$CFG" <<'PY'
import sys

import jax
import yaml

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")
from mmada_tpu.core.config import load_config

cfg = load_config("configs/proxy_campaign_d.yaml")
with open(sys.argv[1], "w") as f:
    yaml.safe_dump(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg), f)
PY
fi
if [ ! -d "$CKPT" ]; then
  python tools/export_checkpoint.py config="$CFG" \
    checkpoint_dir="$CKPT_DIR" out_dir="$CKPT"
fi

# Re-powered gates FIRST (VERDICT r4 #6 — the round's new verdicts),
# then the reproducibility replications of the r03 artifacts.
# n=32 captions (vs the r03 default 16): the round-3u power lesson — 2x
# the truth positions. 32 is ALL of the trained bank (dataset.n_patterns
# default 32) — more would score unmemorized rows.
python tools/mmu_truth_gate.py    ckpt="$CKPT" config="$CFG" n="${MMU_GATE_N:-32}" out="MMU_GATE_${SUF}.json"
python tools/cfg_interval_sweep.py ckpt="$CKPT" config="$CFG" out="CFG_INTERVAL_${SUF}.json"
python tools/quant_gate.py        ckpt="$CKPT" config="$CFG" out="QUANT_${SUF}.json"
python tools/kv_refresh_sweep.py  ckpt="$CKPT" config="$CFG" out="KV_REFRESH_${SUF}.json"
python tools/parallel_sweep.py    ckpt="$CKPT" config="$CFG" out="PARALLEL_${SUF}.json"
python tools/parallel_sweep.py warmup=1 ckpt="$CKPT" config="$CFG" out="PARALLEL_WARMUP_${SUF}.json"
python tools/composed_fast_gate.py ckpt="$CKPT" config="$CFG" out="COMPOSED_FAST_${SUF}.json"
echo "regate done: *_${SUF}.json"
