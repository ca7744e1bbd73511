#!/usr/bin/env bash
# Smoke test (reference test.sh analog: "run for N steps to verify setup").
# Runs the full tiny pipeline on CPU: unit tests, a 4-step multi-task
# training run with a validation generation, a 4-step t2m LoRA run, and the
# inference CLIs + multichip dryrun. ~6-8 minutes.
set -euo pipefail
cd "$(dirname "$0")/.."

PY="python"

if [[ "${SMOKE_FULL:-}" != "1" ]]; then
  echo "(unit suite skipped — run 'python -m pytest tests/ -x -q' separately or set SMOKE_FULL=1)"
fi
if [[ "${SMOKE_FULL:-}" == "1" ]]; then
  # the suite has grown past 10 minutes; it is its own documented gate
  # (`python -m pytest tests/ -x -q`), so the smoke default drives the
  # pipeline surfaces only. SMOKE_FULL=1 restores the all-in-one run.
  echo "== unit tests =="
  $PY -m pytest tests/ -x -q
fi

echo "== tiny multi-task training (4 steps + validation hook) =="
$PY - <<'PYEOF'
import jax; jax.config.update("jax_platforms", "cpu")
import train
assert train.main([
    "config=configs/tiny_test.yaml", "dataset.synthetic=true",
    "training.max_train_steps=4", "experiment.save_every=4",
    "experiment.generate_every=4", "experiment.log_every=2",
    "dataset.params.validation_prompts_file=validation_prompts/text2image_prompts.txt",
    "model.mmada.num_vq_tokens=64", "training.generation_timesteps=2",
    "experiment.output_dir=/tmp/smoke_train",
    "dataset.preprocessing.resolution=16",
]) == 0
PYEOF

echo "== tiny t2m LoRA training (4 steps) =="
$PY - <<'PYEOF'
import jax; jax.config.update("jax_platforms", "cpu")
import train
assert train.main([
    "config=configs/t2m_instruct_lora.yaml", "model.mmada.tiny=true",
    "model.mmada.random_init=true", "model.mmada.motion_vocab_size=16",
    "dataset.synthetic=true", "dataset.max_motion_length=8",
    "training.batch_size_t2m=2", "training.max_train_steps=4",
    "training.mixed_precision=fp32", "experiment.save_every=0",
    "experiment.output_dir=/tmp/smoke_t2m", "experiment.log_every=2",
    "dataset.preprocessing.max_seq_length=8",
]) == 0
PYEOF

echo "== inference CLIs =="
$PY - <<'PYEOF'
import jax; jax.config.update("jax_platforms", "cpu")
import generate, inference_t2i
assert generate.main(["config=configs/tiny_test.yaml", "prompt=hi",
                      "gen_length=16", "steps=8", "block_length=8"]) == 0
assert inference_t2i.main(["config=configs/tiny_test.yaml", "prompt=a cat",
                           "generation_timesteps=2", "guidance_scale=1.5",
                           "output_dir=/tmp/smoke_t2i",
                           "model.mmada.num_vq_tokens=64"]) == 0
PYEOF

echo "== multichip dryrun =="
XLA_FLAGS="--xla_force_host_platform_device_count=8" $PY - <<'PYEOF'
import jax; jax.config.update("jax_platforms", "cpu")
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
PYEOF

echo "SMOKE TEST PASSED"
