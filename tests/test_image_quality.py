"""Golden parity for the JAX CLIP scorer and the ImageReward (BLIP) head.

Unlike the other goldens (generated from /root/reference via
tools/gen_goldens.py), the torch reference for these IS the transformers
library shipped in this environment, so the fixtures are built in-test at
a fixed seed — self-regenerating, never stale. Reference consumer:
train_mmada_stage4.py:1008-1115 (torchmetrics CLIPScore + ImageReward).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_clip():
    from transformers import CLIPConfig, CLIPTextConfig, CLIPVisionConfig, CLIPModel

    tc = CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=99,
        eos_token_id=2,  # newer transformers default 49407 overflows vocab
    )
    vc = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    cfg = CLIPConfig.from_text_vision_configs(tc, vc, projection_dim=24)
    torch.manual_seed(7)
    model = CLIPModel(cfg).eval()
    return model, cfg


@pytest.fixture(scope="module")
def clip_pair():
    from mmada_tpu.eval import clip_jax

    model, hf_cfg = _tiny_clip()
    cfg = clip_jax.CLIPJaxConfig.from_hf(hf_cfg)
    params = clip_jax.from_torch_state(model.state_dict(), cfg)
    return model, cfg, params


def _inputs(cfg, rng):
    # token rows that CONTAIN the eos token mid-sequence (pooling position)
    ids = rng.integers(3, 90, size=(3, 12))
    ids[0, 5] = cfg.eos_token_id
    ids[1, 11] = cfg.eos_token_id
    ids[2, 8] = cfg.eos_token_id
    pixels = rng.normal(size=(3, 3, cfg.image_size, cfg.image_size))
    return ids.astype(np.int64), pixels.astype(np.float32)


def test_text_features_golden(clip_pair):
    from mmada_tpu.eval import clip_jax

    model, cfg, params = clip_pair
    ids, _ = _inputs(cfg, np.random.default_rng(0))
    with torch.no_grad():
        want = model.get_text_features(input_ids=torch.tensor(ids)).numpy()
    got = np.asarray(clip_jax.text_features(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_image_features_golden(clip_pair):
    from mmada_tpu.eval import clip_jax

    model, cfg, params = clip_pair
    _, pixels = _inputs(cfg, np.random.default_rng(1))
    with torch.no_grad():
        want = model.get_image_features(
            pixel_values=torch.tensor(pixels)).numpy()
    got = np.asarray(clip_jax.image_features(params, cfg,
                                             jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_clip_score_matches_torchmetrics_formula(clip_pair):
    """End-to-end score parity against the explicit torch computation
    (normalize → 100·cos → clamp at 0), the torchmetrics CLIPScore body."""
    from mmada_tpu.eval import clip_jax

    model, cfg, params = clip_pair
    ids, pixels = _inputs(cfg, np.random.default_rng(2))
    with torch.no_grad():
        img = model.get_image_features(pixel_values=torch.tensor(pixels))
        txt = model.get_text_features(input_ids=torch.tensor(ids))
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        want = (100.0 * (img * txt).sum(-1)).clamp(min=0).numpy()
    got = np.asarray(clip_jax.clip_scores(
        params, cfg, jnp.asarray(pixels), jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_scorer_integration(clip_pair, tmp_path):
    """ImageQualityScorer wired with the JAX towers produces the stage-4
    summary dict (quantative hook contract)."""
    import jax

    from mmada_tpu.eval import clip_jax
    from mmada_tpu.eval.image_quality import ImageQualityScorer

    model, cfg, params = clip_pair
    ids, pixels = _inputs(cfg, np.random.default_rng(3))

    scorer = ImageQualityScorer(
        image_embed_fn=lambda px: clip_jax.image_features(
            params, cfg, jnp.asarray(np.transpose(px, (0, 3, 1, 2)))),
        text_embed_fn=lambda texts: clip_jax.text_features(
            params, cfg, jnp.asarray(ids[: len(texts)])),
    )
    hwc = np.transpose(pixels, (0, 2, 3, 1))
    out = scorer.quantitative_images(hwc, ["a", "b", "c"])
    assert "clip_score_mean" in out and len(out["clip_score"]) == 3
    assert np.isfinite(out["clip_score_mean"])


# ------------------------------------------------------- ImageReward (BLIP)

def _tiny_blip():
    from transformers import (BlipConfig, BlipForImageTextRetrieval,
                              BlipTextConfig, BlipVisionConfig)

    tc = BlipTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=16, vocab_size=99,
        encoder_hidden_size=32,
    )
    vc = BlipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    cfg = BlipConfig.from_text_vision_configs(tc, vc)
    torch.manual_seed(11)
    return BlipForImageTextRetrieval(cfg).eval(), cfg


@pytest.fixture(scope="module")
def blip_pair():
    from mmada_tpu.eval import image_reward_jax as IR

    model, hf_cfg = _tiny_blip()
    cfg = IR.BlipRewardConfig.from_hf(hf_cfg)
    params = IR.from_blip_torch_state(model.state_dict(), cfg)
    return model, cfg, params


def test_blip_vision_golden(blip_pair):
    from mmada_tpu.eval import image_reward_jax as IR

    model, cfg, params = blip_pair
    rng = np.random.default_rng(4)
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        want = model.vision_model(
            pixel_values=torch.tensor(pixels)).last_hidden_state.numpy()
    got = np.asarray(IR.vision_forward(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_blip_cross_modal_golden(blip_pair):
    """Text encoder cross-attending to the vision tokens — the exact
    forward ImageReward pools its reward feature from."""
    from mmada_tpu.eval import image_reward_jax as IR

    model, cfg, params = blip_pair
    rng = np.random.default_rng(5)
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    ids = rng.integers(3, 90, size=(2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    with torch.no_grad():
        img = model.vision_model(
            pixel_values=torch.tensor(pixels)).last_hidden_state
        want = model.text_encoder(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            encoder_hidden_states=img,
            encoder_attention_mask=torch.ones(img.shape[:2], dtype=torch.long),
        ).last_hidden_state.numpy()
    img_j = IR.vision_forward(params, cfg, jnp.asarray(pixels))
    got = np.asarray(IR.text_forward(params, cfg, jnp.asarray(ids), img_j,
                                     jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_imagereward_head_and_naming(blip_pair):
    """End-to-end rewards() through a synthetic 5-linear MLP head, plus the
    ImageReward-native checkpoint naming roundtrip (timm ViT keys)."""
    from mmada_tpu.eval import image_reward_jax as IR

    model, cfg, params = blip_pair
    rng = np.random.default_rng(6)
    dims = [cfg.text_hidden, 1024 // 16, 128 // 16, 64 // 16, 16 // 16]
    mlp_state = {}
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        mlp_state[f"mlp.layers.{i}.weight"] = rng.normal(size=(b, a)).astype(np.float32)
        mlp_state[f"mlp.layers.{i}.bias"] = rng.normal(size=(b,)).astype(np.float32)
    params = dict(params)
    params["mlp"] = [(jnp.asarray(mlp_state[f"mlp.layers.{i}.weight"].T),
                      jnp.asarray(mlp_state[f"mlp.layers.{i}.bias"]))
                     for i in range(len(dims) - 1)]
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    ids = rng.integers(3, 90, size=(2, 10)).astype(np.int64)

    r = np.asarray(IR.rewards(params, cfg, jnp.asarray(pixels),
                              jnp.asarray(ids)))
    assert r.shape == (2,) and np.isfinite(r).all()

    # torch-side expected: BLIP cross-modal [CLS] -> linear stack -> z-norm
    with torch.no_grad():
        img = model.vision_model(
            pixel_values=torch.tensor(pixels)).last_hidden_state
        txt = model.text_encoder(
            input_ids=torch.tensor(ids),
            encoder_hidden_states=img,
            encoder_attention_mask=torch.ones(img.shape[:2], dtype=torch.long),
        ).last_hidden_state[:, 0].numpy()
    h = txt
    for i in range(len(dims) - 1):
        h = h @ mlp_state[f"mlp.layers.{i}.weight"].T + mlp_state[f"mlp.layers.{i}.bias"]
    want = (h[:, 0] - IR.REWARD_MEAN) / IR.REWARD_STD
    np.testing.assert_allclose(r, want, rtol=1e-4, atol=1e-4)


def test_imagereward_native_naming_roundtrip(blip_pair):
    """from_imagereward_state loads the checkpoint's own key layout
    (blip.visual_encoder timm-ViT + blip.text_encoder + mlp.layers) and
    produces identical outputs to the transformers-naming converter."""
    from mmada_tpu.eval import image_reward_jax as IR

    model, cfg, params = blip_pair
    state = model.state_dict()
    rng = np.random.default_rng(7)

    native = {}
    for k, v in state.items():
        if k.startswith("text_encoder."):
            native["blip." + k] = v
    tv = {
        "cls_token": state["vision_model.embeddings.class_embedding"],
        "pos_embed": state["vision_model.embeddings.position_embedding"],
        "patch_embed.proj.weight": state["vision_model.embeddings.patch_embedding.weight"],
        "patch_embed.proj.bias": state["vision_model.embeddings.patch_embedding.bias"],
        "norm.weight": state["vision_model.post_layernorm.weight"],
        "norm.bias": state["vision_model.post_layernorm.bias"],
    }
    timm_of = {
        "attn.qkv": "self_attn.qkv", "attn.proj": "self_attn.projection",
        "norm1": "layer_norm1", "norm2": "layer_norm2",
        "mlp.fc1": "mlp.fc1", "mlp.fc2": "mlp.fc2",
    }
    for i in range(cfg.vision_layers):
        for timm, hf in timm_of.items():
            for suf in ("weight", "bias"):
                tv[f"blocks.{i}.{timm}.{suf}"] = state[
                    f"vision_model.encoder.layers.{i}.{hf}.{suf}"]
    for k, v in tv.items():
        native[f"blip.visual_encoder.{k}"] = v
    native["mlp.layers.0.weight"] = torch.tensor(
        rng.normal(size=(1, cfg.text_hidden)).astype(np.float32))
    native["mlp.layers.0.bias"] = torch.tensor(np.zeros(1, np.float32))

    p2 = IR.from_imagereward_state(native, cfg)
    pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ids = rng.integers(3, 90, size=(1, 8)).astype(np.int64)
    a = np.asarray(IR.vision_forward(p2, cfg, jnp.asarray(pixels)))
    b = np.asarray(IR.vision_forward(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
    ta = np.asarray(IR.text_forward(p2, cfg, jnp.asarray(ids),
                                    jnp.asarray(a)))
    tb = np.asarray(IR.text_forward(params, cfg, jnp.asarray(ids),
                                    jnp.asarray(b)))
    np.testing.assert_allclose(ta, tb, rtol=1e-6, atol=1e-6)
