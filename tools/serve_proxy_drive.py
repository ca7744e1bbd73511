"""Serve the TRAINED proxy through the production HTTP app and verify
quality at the socket.

Every serving measurement so far used random or zero weights (valid for
speed, silent on quality) and every trained-proxy measurement used the
model API directly. This drive closes the deployment loop: the 10k-step
165M checkpoint (PROXY_TRAIN_r03.md campaign B) is loaded through
`MMadaModel.from_pretrained` by the REAL app (`app.py` HTTP mode), and
requests exercise the gate-promoted fast stack end-to-end:

  * /t2i with training captions at T=0 + kv_cache: the returned PNG is
    compared against (a) the deterministic training pattern and (b) the
    VQ's own reconstruction of it — the trained model memorized
    caption -> VQ codes, so the served image should sit at the VQ
    reconstruction floor;
  * /generate with a bank prompt, exact vs kv_cache+parallel_threshold
    (the promoted modes), latencies and outputs recorded;
  * /stats engine counters prove the requests went through the batching
    engine, not a side path.

    python tools/serve_proxy_drive.py [ckpt=proxy-output/export]
        [config=configs/proxy_160m.yaml] [port=7973]
        [out=SERVE_PROXY_r03.json]
"""

import base64
import io
import json
import logging
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

logger = logging.getLogger("serve_proxy_drive")

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _post(port, path, payload, timeout=600):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        body = json.loads(r.read())
    return body, round(time.perf_counter() - t0, 3)


def _get(port, path, timeout=60):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=timeout
    ) as r:
        return json.loads(r.read())


def main(argv):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = dict(kv.split("=", 1) for kv in argv if "=" in kv)
    ckpt = args.get("ckpt", "proxy-output/export")
    cfg_path = args.get("config", "configs/proxy_160m.yaml")
    port = int(args.get("port", 7973))
    out_path = args.get("out", "SERVE_PROXY_r03.json")

    import numpy as np

    server = subprocess.Popen(
        [sys.executable, "app.py", f"config={cfg_path}",
         "model.mmada.random_init=false",
         f"model.mmada.pretrained_model_path={ckpt}",
         f"port={port}"],
        cwd=REPO, stdout=open("/tmp/serve_proxy_app.log", "w"),
        stderr=subprocess.STDOUT,
    )
    report = {"ckpt": ckpt, "config": cfg_path}
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                if _get(port, "/health")["status"] == "ok":
                    break
            except Exception:
                time.sleep(3)
        else:
            raise TimeoutError("app never became healthy")
        logger.info("app healthy on :%d", port)

        # ------------------------------------------------ text (exact/fast)
        from mmada_tpu.data import synthetic

        prompt = synthetic.sentence(3)[:40]
        gen_kw = dict(prompt=prompt, gen_length=64, steps=32,
                      block_length=32, temperature=0.0, seed=0)
        exact, t_exact = _post(port, "/generate", gen_kw)
        # the PROMOTED fast stack (round-3u): kv at the recommended
        # refresh cadence + tau with spb/2 warmup — the configuration
        # bench.py composes and docs/SERVING.md recommends
        fast_kw = {**gen_kw, "kv_cache": True, "cache_refresh_every": 4,
                   "parallel_threshold": 0.9, "parallel_warmup_steps": 8}
        # warm pass compiled the fast executors; measure second calls
        _post(port, "/generate", fast_kw)
        fast, t_fast = _post(port, "/generate", fast_kw)
        _post(port, "/generate", gen_kw)
        exact, t_exact = _post(port, "/generate", gen_kw)
        report["text"] = {
            "prompt": prompt,
            "exact": {"text": exact["text"], "seconds": t_exact},
            "kv_parallel": {"text": fast["text"], "seconds": t_fast},
            "outputs_match": exact["text"] == fast["text"],
        }
        logger.info("text exact %.2fs vs kv+parallel %.2fs (match=%s)",
                    t_exact, t_fast, report["text"]["outputs_match"])

        # -------------------------------------------------- t2i quality
        from mmada_tpu.core.config import load_config
        from mmada_tpu.serve.loader import build_vq_model
        import jax.numpy as jnp

        cfg = load_config(cfg_path)
        res = int(cfg.get_path("dataset.preprocessing.resolution", 512))
        vq_params, vq_cfg = build_vq_model(cfg)
        from mmada_tpu.models import magvit2

        t2i_rows = []
        for k in range(3):
            cap = synthetic.caption_for(k)
            body, dt = _post(port, "/t2i", {
                "prompt": cap, "timesteps": 15, "guidance_scale": 3.5,
                "temperature": 0.0, "seed": 0, "kv_cache": True,
            })
            from PIL import Image

            img = np.asarray(Image.open(io.BytesIO(
                base64.b64decode(body["image_png_b64"])))).astype(np.float32)
            served = img / 127.5 - 1.0
            target = synthetic.pattern_image(k, res)
            codes = magvit2.get_code(vq_params, vq_cfg,
                                     jnp.asarray(target[None]))
            recon = np.asarray(magvit2.decode_code(vq_params, vq_cfg, codes))[0]
            t2i_rows.append({
                "caption": cap, "seconds": dt,
                "mse_vs_pattern": round(
                    float(((served - target) ** 2).mean()), 5),
                "vq_floor_mse": round(
                    float(((recon - target) ** 2).mean()), 5),
                "mse_vs_vq_recon": round(
                    float(((served - recon) ** 2).mean()), 5),
                "pattern_variance": round(float(target.var()), 5),
            })
            logger.info("t2i %r: %.2fs, served-vs-pattern %.4f (floor %.4f)",
                        cap, dt, t2i_rows[-1]["mse_vs_pattern"],
                        t2i_rows[-1]["vq_floor_mse"])
        report["t2i"] = t2i_rows

        report["engine_stats"] = _get(port, "/stats").get("engine")
        # the VQ reconstruction of the pattern is the best ANY generation
        # can do (the model emits VQ codes); "served explains the pattern
        # nearly as well as the VQ floor does" is the scale-free bar — an
        # absolute mse-vs-recon bar at 0.25*variance wrongly fails
        # low-variance patterns that sit ON the floor (first drive: row 0
        # ratio 0.95 yet flagged)
        near_floor = all(
            r["mse_vs_pattern"] <= 1.25 * r["vq_floor_mse"]
            for r in t2i_rows
        )
        report["ok"] = bool(near_floor and report["text"]["exact"]["text"])
    finally:
        server.terminate()
        server.wait(timeout=60)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"ok": report.get("ok"),
                      "t2i_mse_vs_vq_recon": [r["mse_vs_vq_recon"]
                                              for r in report.get("t2i", [])],
                      "text_match": report.get("text", {}).get(
                          "outputs_match")}))
    logger.info("wrote %s", out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
