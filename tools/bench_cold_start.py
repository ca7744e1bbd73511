"""Measure serving cold-start with and without the persistent XLA cache.

Serving cold-start is compile-dominated: a fresh app process pays the full
sampler compile on its first request (189.6 s for the proxy t2i program,
SERVE_PROXY_r03.json) even though an identical program was compiled by the
previous process. `serving.compilation_cache_dir` (core/compile_cache.py)
persists executables across processes; this tool quantifies the win the
way an operator experiences it — time from process start to first
completed request — by running the SAME single-request workload in three
fresh subprocesses:

  1. cache disabled               (baseline cold start)
  2. cache enabled, empty dir     (cold + one-time cache write)
  3. cache enabled, warm dir      (the restart every deployment repeats)

    python tools/bench_cold_start.py [config=configs/proxy_160m.yaml]
        [ckpt=proxy-output/export] [task=t2i] [out=COLD_START_r03.json]

The workload runs in-process via the serve loader + model API (no HTTP:
socket setup adds noise and the app path is already covered by
tools/serve_proxy_drive.py).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import textwrap
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

_CHILD = textwrap.dedent("""
    import json, sys, time
    sys.path.insert(0, {repo!r})
    t_start = time.perf_counter()

    from mmada_tpu.core.config import load_config
    from mmada_tpu.serve import loader

    cfg = load_config({cfg_path!r})
    cfg.set_path("serving.compilation_cache_dir", {cache_dir!r})
    cfg.set_path("model.mmada.random_init", False)
    cfg.set_path("model.mmada.pretrained_model_path", {ckpt!r})

    import jax
    import jax.numpy as jnp

    tokenizer = loader.build_text_tokenizer(cfg)
    vocab = loader.build_vocab(cfg)
    prompting = loader.build_prompting(cfg, tokenizer, vocab)
    model = loader.build_model(cfg, vocab)
    t_loaded = time.perf_counter()

    task = {task!r}
    if task == "t2i":
        import numpy as np
        num_vq = int(cfg.get_path("model.mmada.num_vq_tokens", 1024))
        mask_id = vocab.mask_token_id
        image_ids = np.full((1, num_vq), mask_id, np.int64)
        ids, attn = prompting((["pattern zero zero zero"], image_ids),
                              "t2i_gen")
        un_ids, un_attn = prompting.t2i_gen_uncond(1, num_vq, mask_id)
        out = model.t2i_generate(
            jnp.asarray(ids), uncond_input_ids=jnp.asarray(un_ids),
            attention_mask=jnp.asarray(attn),
            uncond_attention_mask=jnp.asarray(un_attn),
            timesteps=15, guidance_scale=3.5, temperature=0.0,
            num_vq_tokens=num_vq, key=jax.random.key(0),
        )
    else:
        ids = tokenizer(["story zero zero three : the small fox cr"])
        ids = [[prompting.sp.bos] + list(ids["input_ids"][0])]
        out = model.generate(
            jnp.asarray(ids, jnp.int32), gen_length=64, steps=32,
            block_length=32, temperature=0.0,
        )
    jax.device_get(out.sum())   # axon: block_until_ready does not block
    t_first = time.perf_counter()

    print(json.dumps({{
        "load_s": round(t_loaded - t_start, 2),
        "first_request_s": round(t_first - t_loaded, 2),
        "total_s": round(t_first - t_start, 2),
    }}))
""")


def run_child(cfg_path, ckpt, task, cache_dir):
    code = _CHILD.format(repo=REPO, cfg_path=cfg_path, ckpt=ckpt,
                         task=task, cache_dir=cache_dir or "")
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd=REPO, timeout=1800)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    row = json.loads(out.stdout.strip().splitlines()[-1])
    row["wall_s"] = round(time.perf_counter() - t0, 2)
    return row


def main(argv):
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    cfg_path = args.get("config", "configs/proxy_160m.yaml")
    ckpt = args.get("ckpt", "proxy-output/export")
    task = args.get("task", "t2i")
    out_path = args.get("out", "COLD_START_r03.json")

    cache_dir = tempfile.mkdtemp(prefix="mmada-xla-cache-")
    report = {"config": cfg_path, "ckpt": ckpt, "task": task}
    try:
        report["no_cache"] = run_child(cfg_path, ckpt, task, "")
        print("no_cache:", report["no_cache"], flush=True)
        report["cache_cold"] = run_child(cfg_path, ckpt, task, cache_dir)
        print("cache_cold:", report["cache_cold"], flush=True)
        report["cache_entries"] = len(os.listdir(cache_dir))
        report["cache_warm"] = run_child(cfg_path, ckpt, task, cache_dir)
        print("cache_warm:", report["cache_warm"], flush=True)
        base = report["no_cache"]["first_request_s"]
        warm = report["cache_warm"]["first_request_s"]
        report["first_request_speedup"] = round(base / max(warm, 1e-9), 2)
        report["ok"] = warm < base
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"ok": report.get("ok"),
                      "speedup": report.get("first_request_speedup")}))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
