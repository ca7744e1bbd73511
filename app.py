"""Interactive demo app: text / MMU / t2i panels.

Parity entry point for the reference Gradio demo (app.py:53-894): three
task panels with per-step streaming (token states for text, stepwise image
decode for t2i), lazy model load, thinking-mode toggle. Gradio is not
available in every environment, so:

  * with gradio installed: full three-panel UI (`python app.py config=...`);
  * otherwise: an HTTP JSON API on stdlib http.server exposing
    /generate, /mmu, /t2i with the same semantics (`python app.py
    config=... port=7860`).
"""

import base64
import io
import json
import sys
import threading

import numpy as np

THINK_PREFIX = (
    "You should first think about the reasoning process in the mind and "
    "then provide the user with the answer. The reasoning process is "
    "enclosed within <think> </think> tags."
)  # reference app.py:221-222 thinking-mode instruction


class AppState:
    def __init__(self, cfg):
        from mmada_tpu.serve.loader import load_all

        (self.model, self.vq_params, self.vq_cfg, self.tokenizer,
         self.prompting, self.vocab) = load_all(cfg)
        self.cfg = cfg
        self.lock = threading.Lock()
        self.engine = None  # set by start_engine() in HTTP mode
        # deployment fast-decode defaults, FAMILY-RESOLVED: flat
        # serving.<key> with per-task serving.<task>.<key> overrides —
        # the trained-proxy quality evidence is per-family (BASELINE.md
        # rounds 3q-3u: text needs refresh=4/warmup=spb/2, MMU preserves
        # under the full kv freeze, t2i within slack). Per-request fields
        # still override (loader.task_serving_defaults).
        from mmada_tpu.serve.loader import task_serving_defaults

        # t2m serving runs engine-level only (T2MSettings built by its
        # drivers) — no app surface, so no resolved default here
        self.serving_defaults = {
            t: task_serving_defaults(cfg, t)
            for t in ("text", "mmu", "t2i")
        }

    def start_engine(self):
        """Route text/mmu/t2i requests through the batched ServingEngine:
        concurrent deterministic requests of the same shape micro-batch
        (measured 2.2x aggregate text throughput at batch 8, BASELINE.md;
        t2i runs solo for seed reproducibility — it is compute-bound from
        batch 1 anyway), and the single dispatcher
        thread owns the device. VQ decode stays in the caller thread."""
        from mmada_tpu.serve.engine import ServingEngine

        self.engine = ServingEngine(
            self.model,
            min_chunk_device_ms=float(self.cfg.get_path(
                "serving.min_chunk_device_ms", 25.0)),
        ).start()
        return self

    def stop_engine(self):
        if self.engine is not None:
            self.engine.stop()
            self.engine = None

    # ------------------------------------------------------------- tasks
    def _text_ids(self, prompt):
        """Tokenize with a guaranteed leading BOS. Every LM training frame
        starts with BOS (prompting/universal.py lm(); the reference's chat
        template prepends bos_token, app.py:115), and plain tokenizers like
        ByteTokenizer never insert it — serving a frame the model never saw
        in training collapses output to EOS (found driving the trained
        proxy, SERVE_PROXY_r03.json). Idempotent for HF tokenizers that
        already add it."""
        ids = list(self.tokenizer([prompt])["input_ids"][0])
        bos = self.prompting.sp.bos
        if not ids or ids[0] != bos:
            ids = [bos] + ids
        return [ids]

    def generate_text(self, prompt, gen_length=128, steps=64,
                      block_length=32, temperature=1.0, cfg_scale=0.0,
                      remasking="low_confidence", thinking=False, seed=0,
                      kv_cache=None, parallel_threshold=None,
                      parallel_warmup_steps=None,
                      cache_refresh_every=None, segment_steps=None):
        # None -> deployment-wide serving.* defaults (covers every
        # frontend: HTTP, gradio, direct API use)
        d = self.serving_defaults["text"]
        if kv_cache is None:
            kv_cache = d["kv_cache"]
        if parallel_threshold is None:
            parallel_threshold = d["parallel_threshold"]
        if parallel_warmup_steps is None:
            parallel_warmup_steps = d["parallel_warmup_steps"]
        if cache_refresh_every is None:
            cache_refresh_every = d["cache_refresh_every"]
        if segment_steps is None:
            segment_steps = d["segment_steps"]
        if kv_cache:
            # segmentation applies to the exact sampler only; when the
            # deployment defaults enable BOTH, the cached decode (the
            # bigger latency lever, already per-block programs) wins
            # rather than erroring the request
            segment_steps = 0
        import jax
        import jax.numpy as jnp

        if thinking:
            prompt = THINK_PREFIX + "\n" + prompt
        ids = self._text_ids(prompt)
        if self.engine is not None:
            from mmada_tpu.serve.engine import TextSettings

            settings = TextSettings(
                gen_length=gen_length, steps=steps,
                block_length=block_length, temperature=temperature,
                cfg_scale=cfg_scale, remasking=remasking,
                block_kv_cache=kv_cache, parallel_threshold=parallel_threshold,
                parallel_warmup_steps=parallel_warmup_steps,
                cache_refresh_every=cache_refresh_every,
                segment_steps=segment_steps,
            )
            fut = self.engine.submit_text(
                np.asarray(ids[0], np.int32), settings, seed=seed
            )
            out = fut.result()[None]
        else:
            with self.lock:
                out = self.model.generate(
                    jnp.asarray(ids, jnp.int32),
                    gen_length=gen_length, steps=steps,
                    block_length=block_length, temperature=temperature,
                    cfg_scale=cfg_scale, remasking=remasking,
                    key=jax.random.key(seed)
                    if (temperature > 0 or remasking == "random") else None,
                    block_kv_cache=kv_cache,
                    parallel_threshold=parallel_threshold,
                    parallel_warmup_steps=parallel_warmup_steps,
                    cache_refresh_every=cache_refresh_every,
                    segment_steps=segment_steps,
                )
        answer = np.asarray(out[0, len(ids[0]):])
        answer = answer[answer < self.vocab.text_vocab_size]
        return self.tokenizer.decode(answer.tolist())

    def generate_text_stepwise(self, prompt, gen_length=128, steps=64,
                               block_length=32, temperature=1.0,
                               cfg_scale=0.0, thinking=False, seed=0):
        """Per-step token states for streaming visualization (reference
        app.py:116-165 HighlightedText MASK/GEN panel): one entry per
        denoise step with the answer region's tokens and their state."""
        import jax
        import jax.numpy as jnp

        if thinking:
            prompt = THINK_PREFIX + "\n" + prompt
        ids = self._text_ids(prompt)
        with self.lock:
            traj = self.model.generate_stepwise(
                jnp.asarray(ids, jnp.int32),
                gen_length=gen_length, steps=steps,
                block_length=block_length, temperature=temperature,
                cfg_scale=cfg_scale,
                key=jax.random.key(seed) if temperature > 0 else None,
            )
        traj = np.asarray(traj)[:, 0, len(ids[0]):]  # (steps, gen_length)
        mask_id = self.vocab.mask_token_id
        out = []
        for state in traj:
            toks = []
            for t in state.tolist():
                if t == mask_id:
                    toks.append({"token": "[MASK]", "state": "MASK"})
                elif t < self.vocab.text_vocab_size:
                    toks.append(
                        {"token": self.tokenizer.decode([t]), "state": "GEN"}
                    )
                else:
                    toks.append({"token": f"<{t}>", "state": "GEN"})
            out.append(toks)
        return out

    def generate_text_stepwise_iter(self, prompt, gen_length=128, steps=64,
                                    block_length=32, temperature=1.0,
                                    cfg_scale=0.0, thinking=False, seed=0,
                                    segment_steps=1):
        """INCREMENTAL stepwise token states: yields each denoise step's
        state list as soon as its ≤segment_steps chunk finishes on device
        (MMadaModel.segmented_stepwise_run) — time-to-first-step is one
        chunk, not the whole trajectory program. Step-for-step identical
        to `generate_text_stepwise` (socket-pinned)."""
        import jax
        import jax.numpy as jnp

        if thinking:
            prompt = THINK_PREFIX + "\n" + prompt
        ids = self._text_ids(prompt)
        mask_id = self.vocab.mask_token_id
        run = self.model.segmented_stepwise_run(
            jnp.asarray(ids, jnp.int32),
            gen_length=gen_length, steps=steps, block_length=block_length,
            temperature=temperature, cfg_scale=cfg_scale,
            key=jax.random.key(seed) if temperature > 0 else None,
            segment_steps=max(1, int(segment_steps)),
        )
        while True:
            with self.lock:  # device work inside; socket writes outside
                done = run.step()
                states = np.asarray(run.last_states)[:, 0, len(ids[0]):]
            for state in states:
                toks = []
                for t in state.tolist():
                    if t == mask_id:
                        toks.append({"token": "[MASK]", "state": "MASK"})
                    elif t < self.vocab.text_vocab_size:
                        toks.append({"token": self.tokenizer.decode([t]),
                                     "state": "GEN"})
                    else:
                        toks.append({"token": f"<{t}>", "state": "GEN"})
                yield toks
            if done:
                break

    def t2i(self, prompt, timesteps=15, guidance_scale=3.5,
            temperature=1.0, seed=0, kv_cache=None,
            cache_refresh_every=None, segment_timesteps=None,
            cfg_interval=None):
        d = self.serving_defaults["t2i"]
        if kv_cache is None:
            kv_cache = d["kv_cache"]
        if cache_refresh_every is None:
            cache_refresh_every = d["cache_refresh_every"]
        if segment_timesteps is None:
            segment_timesteps = d["segment_timesteps"]
        if cfg_interval is None:
            cfg_interval = d["cfg_interval"]
        if kv_cache:  # cached decode wins over segmentation + cfg interval
            segment_timesteps = 0
            cfg_interval = (0.0, 1.0)
        import jax
        import jax.numpy as jnp

        from mmada_tpu.models import magvit2

        num_vq = int(self.cfg.get_path("model.mmada.num_vq_tokens", 1024))
        mask_id = self.vocab.mask_token_id
        image_ids = np.full((1, num_vq), mask_id, np.int64)
        input_ids, attn = self.prompting(([prompt], image_ids), "t2i_gen")
        uncond_ids, uncond_attn = self.prompting.t2i_gen_uncond(1, num_vq, mask_id)
        if self.engine is not None:
            from mmada_tpu.serve.engine import T2ISettings

            settings = T2ISettings(
                timesteps=timesteps, guidance_scale=guidance_scale,
                temperature=temperature, num_vq_tokens=num_vq,
                block_kv_cache=kv_cache,
                cache_refresh_every=cache_refresh_every,
                segment_timesteps=segment_timesteps,
                cfg_interval=tuple(cfg_interval),
            )
            fut = self.engine.submit_t2i(
                np.asarray(input_ids[0]), np.asarray(uncond_ids[0]), settings,
                seed=seed,
                attention_mask=np.asarray(attn[0]),
                uncond_attention_mask=np.asarray(uncond_attn[0]),
            )
            codes = jnp.asarray(fut.result()[None])
            with self.lock:
                pixels = magvit2.decode_code(self.vq_params, self.vq_cfg, codes)
        else:
            with self.lock:
                codes = self.model.t2i_generate(
                    jnp.asarray(input_ids),
                    uncond_input_ids=jnp.asarray(uncond_ids),
                    attention_mask=jnp.asarray(attn),
                    uncond_attention_mask=jnp.asarray(uncond_attn),
                    temperature=temperature, timesteps=timesteps,
                    guidance_scale=guidance_scale, num_vq_tokens=num_vq,
                    key=jax.random.key(seed), block_kv_cache=kv_cache,
                    cache_refresh_every=cache_refresh_every,
                    segment_timesteps=segment_timesteps,
                    cfg_interval=tuple(cfg_interval),
                )
                pixels = magvit2.decode_code(self.vq_params, self.vq_cfg, codes)
        arr = np.asarray((np.asarray(pixels[0]) + 1.0) * 127.5).clip(0, 255)
        return arr.astype(np.uint8)

    def t2i_stepwise(self, prompt, timesteps=15, guidance_scale=3.5,
                     temperature=1.0, seed=0):
        """Per-step decoded frames (the reference demo's stepwise image
        yield, app.py:168-203 / t2i_generate_decoding_stepwise)."""
        import jax
        import jax.numpy as jnp

        from mmada_tpu.models import magvit2

        num_vq = int(self.cfg.get_path("model.mmada.num_vq_tokens", 1024))
        mask_id = self.vocab.mask_token_id
        image_ids = np.full((1, num_vq), mask_id, np.int64)
        input_ids, attn = self.prompting(([prompt], image_ids), "t2i_gen")
        uncond_ids, uncond_attn = self.prompting.t2i_gen_uncond(1, num_vq, mask_id)
        with self.lock:
            trajectory = self.model.t2i_generate(
                jnp.asarray(input_ids),
                uncond_input_ids=jnp.asarray(uncond_ids),
                attention_mask=jnp.asarray(attn),
                uncond_attention_mask=jnp.asarray(uncond_attn),
                temperature=temperature, timesteps=timesteps,
                guidance_scale=guidance_scale, num_vq_tokens=num_vq,
                key=jax.random.key(seed), stepwise=True,
            )
            frames = []
            for step_codes in np.asarray(trajectory):
                pixels = magvit2.decode_code(
                    self.vq_params, self.vq_cfg, jnp.asarray(step_codes)
                )
                arr = np.asarray((np.asarray(pixels[0]) + 1.0) * 127.5)
                frames.append(arr.clip(0, 255).astype(np.uint8))
        return frames

    def t2i_stepwise_iter(self, prompt, timesteps=15, guidance_scale=3.5,
                          temperature=1.0, seed=0, segment_timesteps=1):
        """INCREMENTAL stepwise frames: yields each decoded step image as
        soon as its ≤segment_timesteps window finishes on device
        (sampling/t2i.SegmentedT2IRun) — the monolithic `t2i_stepwise`
        cannot emit anything until the whole trajectory program returns.
        Frame-for-frame identical to it (tests pin the byte-equality)."""
        import jax
        import jax.numpy as jnp

        from mmada_tpu.models import magvit2

        num_vq = int(self.cfg.get_path("model.mmada.num_vq_tokens", 1024))
        mask_id = self.vocab.mask_token_id
        image_ids = np.full((1, num_vq), mask_id, np.int64)
        input_ids, attn = self.prompting(([prompt], image_ids), "t2i_gen")
        uncond_ids, uncond_attn = self.prompting.t2i_gen_uncond(1, num_vq, mask_id)
        run = self.model.t2i_segmented_run(
            jnp.asarray(input_ids),
            uncond_input_ids=jnp.asarray(uncond_ids),
            attention_mask=jnp.asarray(attn),
            uncond_attention_mask=jnp.asarray(uncond_attn),
            temperature=temperature, timesteps=timesteps,
            guidance_scale=guidance_scale, num_vq_tokens=num_vq,
            key=jax.random.key(seed),
            segment_timesteps=max(1, int(segment_timesteps)),
        )
        while True:
            # device work under the lock; yields (socket writes to a
            # possibly-slow client) OUTSIDE it — one stalled streaming
            # client must not block every other lock-using endpoint
            with self.lock:
                done = run.step()
                frames = []
                for step_codes in np.asarray(run.last_window):
                    pixels = magvit2.decode_code(
                        self.vq_params, self.vq_cfg, jnp.asarray(step_codes)
                    )
                    arr = np.asarray((np.asarray(pixels[0]) + 1.0) * 127.5)
                    frames.append(arr.clip(0, 255).astype(np.uint8))
            for arr in frames:
                yield arr
            if done:
                break

    def status(self) -> dict:
        """Model registry/status payload (reference app.py:79-123 shows a
        model dropdown + load status; one in-process model here, so the
        registry is its identity card + live engine counters)."""
        import jax

        from mmada_tpu.ops import quantization as Q

        # walk with is_leaf so a quantized leaf counts its LOGICAL shape
        # once (raw tree_leaves adds the scale tensors and halves Int4's
        # packed count — ADVICE r4)
        leaves = jax.tree_util.tree_leaves(
            self.model.params, is_leaf=Q.is_quantized)
        n_params = int(sum(
            np.prod(l.shape) for l in leaves if hasattr(l, "shape")
        ))
        schemes = {type(l).__name__ for l in leaves if Q.is_quantized(l)}
        payload = {
            "model": {
                "layers": self.model.cfg.n_layers,
                "d_model": self.model.cfg.d_model,
                "n_heads": self.model.cfg.n_heads,
                "params": n_params,
                "vocab_size": self.vocab.total_vocab_size,
                "quantized_leaves": sorted(schemes) or ["bf16"],
                "checkpoint": str(self.cfg.get_path(
                    "model.mmada.pretrained_model_path", "(random init)")),
            },
            "vq_model_loaded": self.vq_params is not None,
            "devices": [str(d) for d in jax.devices()],
            "engine_running": self.engine is not None,
        }
        if self.engine is not None:
            payload["engine"] = dict(self.engine.stats)
            payload["latency"] = self.engine.latency_stats()
        return payload

    def mmu(self, image_arr, question, max_new_tokens=128, steps=64,
            block_length=64, temperature=0.0, cfg_scale=0.0,
            remasking="low_confidence", seed=0, kv_cache=None,
            parallel_threshold=None, parallel_warmup_steps=None,
            cache_refresh_every=None, segment_steps=None,
            thinking=False):
        d = self.serving_defaults["mmu"]
        if kv_cache is None:
            kv_cache = d["kv_cache"]
        if parallel_threshold is None:
            parallel_threshold = d["parallel_threshold"]
        if parallel_warmup_steps is None:
            parallel_warmup_steps = d["parallel_warmup_steps"]
        if cache_refresh_every is None:
            cache_refresh_every = d["cache_refresh_every"]
        if segment_steps is None:
            segment_steps = d["segment_steps"]
        if kv_cache:  # cached decode wins over segmentation (see generate_text)
            segment_steps = 0
        if image_arr is None:
            return "(no image provided)"
        import jax
        import jax.numpy as jnp

        from mmada_tpu.models import magvit2

        with self.lock:
            codes = magvit2.get_code(
                self.vq_params, self.vq_cfg, jnp.asarray(image_arr)[None]
            )
        fused = np.asarray(codes)[0] + self.vocab.image_offset
        sp = self.prompting.sp
        if thinking:
            # reference app.py:380-381: MMU thinking-mode instruction
            # prepended to the question
            question = THINK_PREFIX + "\n" + question
        text_ids = self.tokenizer([question])["input_ids"][0]
        frame = np.concatenate(
            [[sp.mmu, sp.soi], fused, [sp.eoi, sp.bos], text_ids]
        ).astype(np.int32)[None]
        if self.engine is not None:
            from mmada_tpu.serve.engine import TextSettings

            settings = TextSettings(
                gen_length=max_new_tokens, steps=steps,
                block_length=block_length, temperature=temperature,
                cfg_scale=cfg_scale, remasking=remasking,
                block_kv_cache=kv_cache, parallel_threshold=parallel_threshold,
                parallel_warmup_steps=parallel_warmup_steps,
                cache_refresh_every=cache_refresh_every,
                segment_steps=segment_steps,
            )
            fut = self.engine.submit_mmu(frame[0], settings, seed=seed)
            out = fut.result()[None]
        else:
            with self.lock:
                out = self.model.mmu_generate(
                    jnp.asarray(frame), max_new_tokens=max_new_tokens,
                    steps=steps, block_length=block_length,
                    temperature=temperature, cfg_scale=cfg_scale,
                    remasking=remasking, key=jax.random.key(seed),
                    block_kv_cache=kv_cache,
                    parallel_threshold=parallel_threshold,
                    parallel_warmup_steps=parallel_warmup_steps,
                    cache_refresh_every=cache_refresh_every,
                    segment_steps=segment_steps,
                )
        answer = np.asarray(out[0, frame.shape[1]:])
        answer = answer[answer < self.vocab.text_vocab_size]
        return self.tokenizer.decode(answer.tolist())


def run_http(state: AppState, port: int):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from mmada_tpu.core.config import parse_cfg_interval, parse_kv_cache

    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        # chunked Transfer-Encoding (the /t2i_stepwise stream) is an
        # HTTP/1.1 feature; _reply always sends Content-Length so
        # keep-alive stays correct on every other path
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _reply(self, payload, code=200):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._reply({"status": "ok"})
            elif self.path == "/stats":
                st = state.status()
                # keep the flat legacy keys HTTP clients already consume
                st["vocab_size"] = st["model"]["vocab_size"]
                st["model_layers"] = st["model"]["layers"]
                st["d_model"] = st["model"]["d_model"]
                self._reply(st)
            else:
                self._reply({"error": "not found"}, 404)

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if self.path == "/generate":
                    text = state.generate_text(
                        req.get("prompt", ""),
                        gen_length=int(req.get("gen_length", 128)),
                        steps=int(req.get("steps", 64)),
                        block_length=int(req.get("block_length", 32)),
                        temperature=float(req.get("temperature", 1.0)),
                        cfg_scale=float(req.get("cfg_scale", 0.0)),
                        remasking=req.get("remasking", "low_confidence"),
                        thinking=bool(req.get("thinking", False)),
                        seed=int(req.get("seed", 0)),
                        kv_cache=(parse_kv_cache(req["kv_cache"])
                                  if "kv_cache" in req else None),
                        parallel_threshold=(
                            float(req["parallel_threshold"])
                            if "parallel_threshold" in req else None),
                        parallel_warmup_steps=(
                            int(req["parallel_warmup_steps"])
                            if "parallel_warmup_steps" in req else None),
                        cache_refresh_every=(
                            int(req["cache_refresh_every"])
                            if "cache_refresh_every" in req else None),
                        segment_steps=(
                            int(req["segment_steps"])
                            if "segment_steps" in req else None),
                    )
                    self._reply({"text": text})
                elif self.path == "/generate_stepwise":
                    skw = dict(
                        gen_length=int(req.get("gen_length", 128)),
                        steps=int(req.get("steps", 64)),
                        block_length=int(req.get("block_length", 32)),
                        temperature=float(req.get("temperature", 1.0)),
                        cfg_scale=float(req.get("cfg_scale", 0.0)),
                        thinking=bool(req.get("thinking", False)),
                        seed=int(req.get("seed", 0)),
                    )
                    if req.get("stream"):
                        # NDJSON: one line per denoise step, emitted as
                        # its chunk finishes (time-to-first-step is one
                        # chunk; same framing rules as /t2i_stepwise)
                        self.send_response(200)
                        self.send_header("Content-Type",
                                         "application/x-ndjson")
                        self.send_header("Transfer-Encoding", "chunked")
                        self.end_headers()

                        def emit(obj):
                            data = (json.dumps(obj) + "\n").encode()
                            self.wfile.write(
                                f"{len(data):X}\r\n".encode()
                                + data + b"\r\n"
                            )
                            self.wfile.flush()

                        try:
                            for toks in state.generate_text_stepwise_iter(
                                req.get("prompt", ""),
                                segment_steps=int(
                                    req.get("segment_steps", 1)
                                ),
                                **skw,
                            ):
                                emit({"step": toks})
                            self.wfile.write(b"0\r\n\r\n")
                        except (BrokenPipeError, ConnectionResetError):
                            self.close_connection = True
                        except Exception as e:
                            try:
                                emit({"error": str(e)})
                                self.wfile.write(b"0\r\n\r\n")
                            except Exception:
                                self.close_connection = True
                        return
                    steps = state.generate_text_stepwise(
                        req.get("prompt", ""), **skw)
                    self._reply({"steps": steps})
                elif self.path == "/t2i":
                    arr = state.t2i(
                        req.get("prompt", ""),
                        timesteps=int(req.get("timesteps", 15)),
                        guidance_scale=float(req.get("guidance_scale", 3.5)),
                        temperature=float(req.get("temperature", 1.0)),
                        seed=int(req.get("seed", 0)),
                        kv_cache=(parse_kv_cache(req["kv_cache"])
                                  if "kv_cache" in req else None),
                        cache_refresh_every=(
                            int(req["cache_refresh_every"])
                            if "cache_refresh_every" in req else None),
                        segment_timesteps=(
                            int(req["segment_timesteps"])
                            if "segment_timesteps" in req else None),
                        cfg_interval=(
                            parse_cfg_interval(req["cfg_interval"])
                            if "cfg_interval" in req else None),
                    )
                    buf = io.BytesIO()
                    Image.fromarray(arr).save(buf, format="PNG")
                    self._reply(
                        {"image_png_b64": base64.b64encode(buf.getvalue()).decode()}
                    )
                elif self.path == "/t2i_stepwise":
                    kw = dict(
                        timesteps=int(req.get("timesteps", 15)),
                        guidance_scale=float(req.get("guidance_scale", 3.5)),
                        temperature=float(req.get("temperature", 1.0)),
                        seed=int(req.get("seed", 0)),
                    )
                    if req.get("stream"):
                        # NDJSON over chunked transfer: one line per frame,
                        # emitted as soon as its device window finishes —
                        # time-to-first-frame is one window, not the whole
                        # trajectory (AppState.t2i_stepwise_iter)
                        self.send_response(200)
                        self.send_header("Content-Type",
                                         "application/x-ndjson")
                        self.send_header("Transfer-Encoding", "chunked")
                        self.end_headers()

                        def emit(obj):
                            data = (json.dumps(obj) + "\n").encode()
                            self.wfile.write(
                                f"{len(data):X}\r\n".encode()
                                + data + b"\r\n"
                            )
                            self.wfile.flush()

                        # headers are out: any failure must resolve
                        # INSIDE the chunked framing (an error line or a
                        # dropped connection), never a second HTTP
                        # response spliced into the body
                        try:
                            for arr in state.t2i_stepwise_iter(
                                req.get("prompt", ""),
                                segment_timesteps=int(
                                    req.get("segment_timesteps", 1)
                                ),
                                **kw,
                            ):
                                buf = io.BytesIO()
                                Image.fromarray(arr).save(buf, format="PNG")
                                emit({"frame_png_b64":
                                      base64.b64encode(
                                          buf.getvalue()).decode()})
                            self.wfile.write(b"0\r\n\r\n")
                        except (BrokenPipeError, ConnectionResetError):
                            self.close_connection = True
                        except Exception as e:
                            try:
                                emit({"error": str(e)})
                                self.wfile.write(b"0\r\n\r\n")
                            except Exception:
                                self.close_connection = True
                        return
                    frames = state.t2i_stepwise(req.get("prompt", ""), **kw)
                    out = []
                    for arr in frames:
                        buf = io.BytesIO()
                        Image.fromarray(arr).save(buf, format="PNG")
                        out.append(base64.b64encode(buf.getvalue()).decode())
                    self._reply({"frames_png_b64": out})
                elif self.path == "/mmu":
                    img = Image.open(
                        io.BytesIO(base64.b64decode(req["image_png_b64"]))
                    )
                    from mmada_tpu.data.transforms import image_transform

                    res = int(
                        state.cfg.get_path("dataset.preprocessing.resolution", 512)
                    )
                    text = state.mmu(
                        image_transform(img, res),
                        req.get("question", "Describe this image."),
                        thinking=bool(req.get("thinking", False)),
                        max_new_tokens=int(req.get("max_new_tokens", 128)),
                        steps=int(req.get("steps", 64)),
                        block_length=int(req.get("block_length", 64)),
                        temperature=float(req.get("temperature", 0.0)),
                        cfg_scale=float(req.get("cfg_scale", 0.0)),
                        remasking=req.get("remasking", "low_confidence"),
                        seed=int(req.get("seed", 0)),
                        kv_cache=(parse_kv_cache(req["kv_cache"])
                                  if "kv_cache" in req else None),
                        parallel_threshold=(
                            float(req["parallel_threshold"])
                            if "parallel_threshold" in req else None),
                        parallel_warmup_steps=(
                            int(req["parallel_warmup_steps"])
                            if "parallel_warmup_steps" in req else None),
                        cache_refresh_every=(
                            int(req["cache_refresh_every"])
                            if "cache_refresh_every" in req else None),
                        segment_steps=(
                            int(req["segment_steps"])
                            if "segment_steps" in req else None),
                    )
                    self._reply({"text": text})
                else:
                    self._reply({"error": "unknown endpoint"}, 404)
            except Exception as e:
                self._reply({"error": str(e)}, 500)

    state.start_engine()
    server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
    print(f"serving on http://0.0.0.0:{port} (endpoints: /health /stats /generate /generate_stepwise /t2i /t2i_stepwise /mmu)")
    try:
        server.serve_forever()
    finally:
        state.stop_engine()


def run_gradio(state: AppState, port: int):  # pragma: no cover - optional dep
    import gradio as gr

    with gr.Blocks(title="MMaDA-TPU") as demo:
        with gr.Tab("Text Generation"):
            inp = gr.Textbox(label="Prompt")
            think = gr.Checkbox(label="Thinking mode")
            viz = gr.HighlightedText(
                label="Denoising (per step)",
                color_map={"MASK": "gray", "GEN": "green"},
            )
            out = gr.Textbox(label="Output")

            def _stream_text(p, t):
                # per-step MASK/GEN states (reference app.py:116-165)
                steps = state.generate_text_stepwise(p, thinking=t)
                for s in steps:
                    yield [(tok["token"], tok["state"]) for tok in s], ""
                final = "".join(
                    tok["token"] for tok in steps[-1]
                    if tok["state"] == "GEN" and not tok["token"].startswith("<")
                )
                yield [(tok["token"], tok["state"]) for tok in steps[-1]], final

            gr.Button("Generate").click(_stream_text, [inp, think], [viz, out])
        with gr.Tab("Text To Image"):
            p2 = gr.Textbox(label="Prompt")
            stepwise = gr.Checkbox(
                label="Stepwise (stream each denoising window's decode)",
                value=True,
            )
            img = gr.Image(label="Image")

            def _t2i_ui(p, sw):
                # stepwise: the UI shows each ≤window decode as soon as
                # its device segment finishes (reference app.py:168-203
                # yields a PIL image per step) — same frames the HTTP
                # /t2i_stepwise NDJSON stream serves, byte-equal by test
                if sw:
                    yield from state.t2i_stepwise_iter(p)
                else:
                    yield state.t2i(p)

            gr.Button("Generate").click(_t2i_ui, [p2, stepwise], img)
        with gr.Tab("Image Understanding"):
            img_in = gr.Image(label="Image", type="numpy")
            q = gr.Textbox(label="Question")
            think_mmu = gr.Checkbox(
                label="Thinking mode"  # reference app.py:380-381
            )
            fast = gr.Checkbox(
                label="Fast decode (block-KV cache — approximate)"
            )
            a = gr.Textbox(label="Answer")
            def _mmu_ui(i, qq, t, f):
                if i is None:
                    return "(no image provided)"
                from PIL import Image as _Image

                from mmada_tpu.data.transforms import image_transform

                res = int(
                    state.cfg.get_path("dataset.preprocessing.resolution", 512)
                )
                pixels = image_transform(_Image.fromarray(i), res)
                return state.mmu(pixels, qq, thinking=t,
                                 kv_cache=True if f else None)

            gr.Button("Ask").click(_mmu_ui, [img_in, q, think_mmu, fast], a)
        with gr.Tab("Model Status"):
            # model registry/status panel (reference app.py:79-123): the
            # loaded model's identity card + live engine counters
            status_json = gr.JSON(label="Registry / engine status")
            gr.Button("Refresh").click(lambda: state.status(), None,
                                       status_json)
    demo.launch(server_port=port)


def main(argv):
    from mmada_tpu.core.config import load_config

    cfg = load_config(cli_args=argv)
    port = int(cfg.get("port", 7860))
    state = AppState(cfg)
    try:
        import gradio  # noqa: F401

        run_gradio(state, port)
    except ImportError:
        run_http(state, port)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
