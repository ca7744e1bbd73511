"""HTTP demo app: all endpoints exercised against a live server."""

import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

PORT = 7893


@pytest.fixture(scope="module")
def server():
    import app as app_mod
    from mmada_tpu.core.config import load_config

    cfg = load_config(
        "configs/tiny_test.yaml",
        overrides=[
            "model.mmada.num_vq_tokens=64",
            "dataset.preprocessing.resolution=16",
        ],
    )
    state = app_mod.AppState(cfg)
    thread = threading.Thread(
        target=app_mod.run_http, args=(state, PORT), daemon=True
    )
    thread.start()
    time.sleep(1.0)
    return state


def post(path, payload, timeout=300):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        json.dumps(payload).encode(),
        {"Content-Type": "application/json"},
    )
    return json.loads(urllib.request.urlopen(req, timeout=timeout).read())


def test_health(server):
    out = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{PORT}/health").read()
    )
    assert out == {"status": "ok"}


def test_generate(server):
    out = post("/generate", {
        "prompt": "hello", "gen_length": 16, "steps": 8,
        "block_length": 8, "temperature": 0.0,
    })
    assert isinstance(out["text"], str)


def test_generate_stepwise(server):
    out = post("/generate_stepwise", {
        "prompt": "hello", "gen_length": 16, "steps": 8,
        "block_length": 8, "temperature": 0.0,
    })
    steps = out["steps"]
    assert len(steps) == 8
    assert all(len(s) == 16 for s in steps)
    assert all(t["state"] in ("MASK", "GEN") for s in steps for t in s)
    # NOTE: with random tiny weights the argmax can legitimately be the mask
    # token, so full resolution isn't asserted here — the mask-monotonicity
    # and termination semantics are covered token-exactly against the torch
    # golden in test_sampler_parity.py::test_text_generate_stepwise_trajectory


def test_t2i_and_stepwise(server):
    out = post("/t2i", {"prompt": "a cat", "timesteps": 2,
                        "guidance_scale": 1.5})
    png = base64.b64decode(out["image_png_b64"])
    from PIL import Image

    img = Image.open(io.BytesIO(png))
    assert img.size == (16, 16)

    out = post("/t2i_stepwise", {"prompt": "a cat", "timesteps": 2,
                                 "guidance_scale": 1.5})
    assert len(out["frames_png_b64"]) == 2


def test_mmu_with_seed(server):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    ).save(buf, format="PNG")
    payload = {
        "image_png_b64": base64.b64encode(buf.getvalue()).decode(),
        "question": "what?", "max_new_tokens": 16, "steps": 8,
        "block_length": 16, "seed": 3,
    }
    out = post("/mmu", payload)
    assert isinstance(out["text"], str)


def test_concurrent_generate_micro_batches(server):
    """HTTP mode routes /generate through the ServingEngine: concurrent
    deterministic same-shape requests share a device batch, and results
    match the sequential ones."""
    payload = {"prompt": "hello", "gen_length": 16, "steps": 8,
               "block_length": 8, "temperature": 0.0}
    want = post("/generate", payload)["text"]
    stats0 = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{PORT}/stats").read()
    )["engine"]

    results = [None] * 4
    def worker(i):
        results[i] = post("/generate", payload)["text"]
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r == want for r in results)

    stats1 = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{PORT}/stats").read()
    )["engine"]
    new_requests = stats1["requests"] - stats0["requests"]
    new_batches = stats1["batches"] - stats0["batches"]
    assert new_requests == 4
    assert new_batches < 4  # actually micro-batched, not serialized


def test_unknown_endpoint_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        post("/nope", {})
    assert e.value.code == 404


def test_malformed_body_is_500_not_crash(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/generate", b"{not json",
        {"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 500
    # server still alive
    test_health(server)


def test_generate_kv_cache_modes(server):
    """kv_cache accepts true AND "int8" at the socket (bool("int8") would
    silently downgrade the quantized cache — core.config.parse_kv_cache);
    deterministic requests agree across modes on the confident tiny model
    or at minimum return well-formed text."""
    base = {"prompt": "hi", "gen_length": 16, "steps": 2,
            "block_length": 8, "temperature": 0.0}
    exact = post("/generate", base)
    cached = post("/generate", {**base, "kv_cache": True})
    int8 = post("/generate", {**base, "kv_cache": "int8"})
    assert "text" in exact and "text" in cached and "text" in int8
    # steps == num_blocks -> fresh cache every step -> bf16-cached output
    # must equal the exact sampler's
    assert cached["text"] == exact["text"]
    import urllib.error

    import pytest as _pytest
    with _pytest.raises(urllib.error.HTTPError):
        post("/generate", {**base, "kv_cache": "quantized"})


def test_generate_segment_steps_at_socket(server):
    """segment_steps routes the request through the engine's chunked
    dispatcher (serve/engine._step_active) and must return the exact
    sampler's tokens; combined with kv_cache the cached decode wins
    (app-level conflict resolution) instead of erroring."""
    base = {"prompt": "hi", "gen_length": 16, "steps": 8,
            "block_length": 8, "temperature": 0.0}
    exact = post("/generate", base)
    seg = post("/generate", {**base, "segment_steps": 2})
    assert seg["text"] == exact["text"]
    both = post("/generate", {**base, "segment_steps": 2,
                              "kv_cache": True})
    assert isinstance(both["text"], str)  # resolved, not a 500


def test_t2i_segment_timesteps_at_socket(server):
    """t2i segment_timesteps routes through the chunked dispatcher and
    must return the same image as the monolithic engine path (same solo
    batch key); with kv_cache both set, the cached decode wins."""
    base = {"prompt": "a cat", "timesteps": 4, "seed": 11}
    mono = post("/t2i", base, timeout=600)
    seg = post("/t2i", {**base, "segment_timesteps": 2}, timeout=600)
    assert seg["image_png_b64"] == mono["image_png_b64"]
    both = post("/t2i", {**base, "segment_timesteps": 2, "kv_cache": True},
                timeout=600)
    assert "image_png_b64" in both


def test_t2i_stepwise_stream_matches_batch(server):
    """stream=true yields NDJSON frames over chunked transfer, one per
    denoise step, byte-identical to the batch endpoint's frames (same
    seed) — the incremental-streaming contract at the socket."""
    payload = {"prompt": "a dog", "timesteps": 4, "seed": 7}
    batch = post("/t2i_stepwise", payload, timeout=600)["frames_png_b64"]

    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/t2i_stepwise",
        json.dumps({**payload, "stream": True,
                    "segment_timesteps": 2}).encode(),
        {"Content-Type": "application/json"},
    )
    streamed = []
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.headers.get("Content-Type") == "application/x-ndjson"
        for line in resp:
            line = line.strip()
            if line:
                streamed.append(json.loads(line)["frame_png_b64"])
    assert streamed == batch


def test_generate_stepwise_stream_matches_batch(server):
    """stream=true yields one NDJSON line per denoise step, identical to
    the batch endpoint's steps list (same seed)."""
    payload = {"prompt": "hi", "gen_length": 16, "steps": 8,
               "block_length": 8, "temperature": 1.0, "seed": 5}
    batch = post("/generate_stepwise", payload, timeout=600)["steps"]
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}/generate_stepwise",
        json.dumps({**payload, "stream": True,
                    "segment_steps": 3}).encode(),
        {"Content-Type": "application/json"},
    )
    streamed = []
    with urllib.request.urlopen(req, timeout=600) as resp:
        for line in resp:
            line = line.strip()
            if line:
                streamed.append(json.loads(line)["step"])
    assert streamed == batch


def test_stats_model_registry(server):
    """/stats carries the model registry payload (AppState.status):
    identity card + engine counters + legacy flat keys."""
    out = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{PORT}/stats").read()
    )
    assert out["model"]["layers"] == out["model_layers"]
    assert out["model"]["params"] > 0
    assert out["model"]["quantized_leaves"] == ["bf16"]
    assert out["vq_model_loaded"] is True
    assert out["engine_running"] is True
    assert "requests" in out["engine"]


def test_mmu_thinking_prepends_instruction(server):
    """thinking=true reaches AppState.mmu and prepends the reference's
    think-instruction to the question before tokenization
    (reference app.py:380-381)."""
    import app as app_mod

    seen = []
    orig = server.tokenizer.__call__

    class _Spy:
        def __call__(self, texts, **kw):
            seen.extend(texts)
            return orig(texts, **kw)

        def __getattr__(self, name):
            return getattr(orig.__self__, name)

    # the real instruction (~230 byte-tokens) overflows the tiny test
    # model's 256-position RoPE table — shrink it for the wiring check
    # (the server thread shares this process, so the patch reaches it)
    tok, server.tokenizer = server.tokenizer, _Spy()
    prefix, app_mod.THINK_PREFIX = app_mod.THINK_PREFIX, "THINK:"
    try:
        buf = io.BytesIO()
        from PIL import Image
        Image.fromarray(
            (np.random.default_rng(1).random((32, 32, 3)) * 255)
            .astype(np.uint8)
        ).save(buf, format="PNG")
        out = post("/mmu", {
            "image_png_b64": base64.b64encode(buf.getvalue()).decode(),
            "question": "what?", "max_new_tokens": 16, "steps": 8,
            "block_length": 16, "thinking": True,
        })
        assert isinstance(out["text"], str)
    finally:
        server.tokenizer = tok
        app_mod.THINK_PREFIX = prefix
    assert any(t.startswith("THINK:") and t.endswith("what?")
               for t in seen), seen
