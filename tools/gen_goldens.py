"""Generate golden test fixtures from the PyTorch reference at /root/reference.

Builds tiny randomly-initialized reference models, runs forwards and the
denoise loops in their deterministic configurations, and saves inputs,
weights (flat torch state-dict as numpy), and outputs to tests/goldens/.
The JAX test suite then checks numerical/token parity WITHOUT needing the
reference at test time.

Deterministic configurations used:
  * forward logits: exact function of weights — fp32 elementwise compare.
  * semi-AR text generate: temperature 0 (pure argmax), 'low_confidence'
    remasking — token-exact compare. Run with cfg_scale 0 and >0.
  * MaskGIT t2i: temperature 0 + torch.multinomial monkeypatched to argmax
    (stochastic draws are the only RNG in the loop) — token-exact compare
    of the full loop logic (CFG combine, window slicing, schedule,
    confidence cutoff, clamping).

Usage: python tools/gen_goldens.py
"""

import os
import sys

import numpy as np
import torch

REFERENCE = os.environ.get("MMADA_REFERENCE", "/root/reference")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

sys.path.insert(0, REFERENCE)

# `models/__init__.py` eagerly imports the VQGAN stack, which needs
# `diffusers` (absent here). Register a namespace package pointing at the
# reference's models/ dir so submodules import directly, bypassing __init__.
import types

_pkg = types.ModuleType("refmodels")
_pkg.__path__ = [os.path.join(REFERENCE, "models")]
sys.modules["refmodels"] = _pkg


def _ref(name):
    import importlib

    return importlib.import_module(f"refmodels.{name}")

TEXT_LEN = 64          # pretend tokenizer length
CODEBOOK = 16          # image codebook
VOCAB = 96             # fused vocab (text 64 + image 16 + slack)
MASK_ID = 90
BOS, EOS, PAD = 1, 2, 3
SOI, EOI, T2I = 10, 11, 12


def build_tiny(n_kv_heads=None, block_type="llama", weight_tying=False,
               seed=0):
    LLaDAConfig = _ref("configuration_llada").LLaDAConfig
    LLaDAModelLM = _ref("modeling_llada").LLaDAModelLM

    torch.manual_seed(seed)
    cfg = LLaDAConfig(
        d_model=64,
        n_heads=4,
        n_kv_heads=n_kv_heads,
        n_layers=2,
        mlp_hidden_size=128,
        vocab_size=VOCAB,
        embedding_size=VOCAB,
        max_sequence_length=128,
        rope=True,
        rope_theta=10000.0,
        attention_dropout=0.0,
        residual_dropout=0.0,
        embedding_dropout=0.0,
        layer_norm_type="rms",
        activation_type="silu",
        block_type=block_type,
        weight_tying=weight_tying,
        include_bias=False,
        include_qkv_bias=False,
        alibi=False,
        flash_attention=False,
        mask_token_id=MASK_ID,
        pad_token_id=PAD,
        eos_token_id=EOS,
        bos_token_id=BOS,
    )
    model = LLaDAModelLM(cfg, init_params=True)
    model.eval()
    # Give weights a healthy spread so logits are not degenerate.
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                p.normal_(0.0, 0.05)
    return model, cfg


def state_to_numpy(model):
    return {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}


def save(name, **arrays):
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}: {list(arrays)[:8]}{'...' if len(arrays) > 8 else ''}")


def golden_forward():
    for tag, kwargs in {
        "mha": dict(),
        "gqa": dict(n_kv_heads=2),
        "seq": dict(block_type="sequential", weight_tying=True),
    }.items():
        model, _ = build_tiny(**kwargs)
        rng = np.random.default_rng(42)
        ids = rng.integers(0, VOCAB, size=(2, 24))
        x = torch.tensor(ids, dtype=torch.long)
        with torch.no_grad():
            logits = model(x).logits.float().numpy()
        # masked variant: pairwise bias from an attention mask with pads
        mask = np.ones((2, 24), dtype=np.int64)
        mask[0, :4] = 0
        am = torch.tensor(mask)
        bias = (am[:, :, None] & am[:, None, :]).bool().unsqueeze(1)
        with torch.no_grad():
            logits_masked = model(x, attention_bias=bias).logits.float().numpy()
        state = state_to_numpy(model)
        save(
            f"forward_{tag}",
            input_ids=ids,
            attention_mask=mask,
            logits=logits,
            logits_masked=logits_masked,
            **{f"w::{k}": v for k, v in state.items()},
        )


def golden_text_generate():
    # generate.py does `from models import MMadaModelLM`; satisfy it without
    # triggering the reference models/__init__ (which needs diffusers).
    fake_models = types.ModuleType("models")
    fake_models.MMadaModelLM = _ref("modeling_mmada").MMadaModelLM
    sys.modules.setdefault("models", fake_models)
    import generate as ref_generate

    model, _ = build_tiny()
    rng = np.random.default_rng(7)
    prompt = rng.integers(4, TEXT_LEN, size=(2, 5))
    pt = torch.tensor(prompt, dtype=torch.long)
    outs = {}
    for cfg_scale in (0.0, 1.5):
        with torch.no_grad():
            out = ref_generate.generate(
                model, pt, steps=8, gen_length=16, block_length=8,
                temperature=0.0, cfg_scale=cfg_scale,
                remasking="low_confidence", mask_id=MASK_ID,
            )
        outs[f"out_cfg{cfg_scale}"] = out.numpy()
    state = state_to_numpy(model)
    save(
        "text_generate",
        prompt=prompt,
        **outs,
        **{f"w::{k}": v for k, v in state.items()},
    )


class _FakeTokenizer:
    def __len__(self):
        return TEXT_LEN


class _FakeUniPrompting:
    text_tokenizer = _FakeTokenizer()


def golden_t2i():
    mm = _ref("modeling_mmada")
    MMadaModelLM, MMadaConfig = mm.MMadaModelLM, mm.MMadaConfig
    ModelConfig = _ref("configuration_llada").ModelConfig

    import dataclasses as _dc

    base_kwargs = {f.name: getattr(ModelConfig(), f.name) for f in _dc.fields(ModelConfig)}

    torch.manual_seed(0)
    cfg = MMadaConfig(
        **{k: v for k, v in base_kwargs.items() if k not in {
            "d_model", "n_heads", "n_layers", "mlp_hidden_size", "vocab_size",
            "embedding_size", "max_sequence_length", "rope", "rope_theta",
            "attention_dropout", "residual_dropout", "embedding_dropout",
            "layer_norm_type", "activation_type", "block_type", "weight_tying",
            "include_bias", "include_qkv_bias", "alibi", "flash_attention",
            "mask_token_id", "pad_token_id", "eos_token_id", "bos_token_id",
        }},
        d_model=64, n_heads=4, n_layers=2, mlp_hidden_size=128,
        vocab_size=VOCAB, embedding_size=VOCAB, max_sequence_length=128,
        rope=True, rope_theta=10000.0,
        attention_dropout=0.0, residual_dropout=0.0, embedding_dropout=0.0,
        layer_norm_type="rms", activation_type="silu", block_type="llama",
        weight_tying=False, include_bias=False, include_qkv_bias=False,
        alibi=False, flash_attention=False,
        mask_token_id=MASK_ID, pad_token_id=PAD, eos_token_id=EOS,
        bos_token_id=BOS,
        llm_vocab_size=TEXT_LEN, codebook_size=CODEBOOK,
        num_vq_tokens=16, new_vocab_size=VOCAB,
        use_cache=False,
    )
    model = MMadaModelLM(cfg, init_params=True)
    model.eval()
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                p.normal_(0.0, 0.05)

    n_img = 16
    prompt_len = 8  # [PAD, PAD, T2I, BOS, w, w, w, EOS]
    rng = np.random.default_rng(3)
    words = rng.integers(13, TEXT_LEN, size=(2, 3))
    frames = []
    uncond_frames = []
    for b in range(2):
        text = [PAD, PAD, T2I, BOS, *words[b].tolist(), EOS]
        frames.append(text + [SOI] + [MASK_ID] * n_img + [EOI])
        uncond = [PAD] * 4 + [T2I, BOS, EOS, EOS]
        uncond_frames.append(uncond + [SOI] + [MASK_ID] * n_img + [EOI])
    input_ids = torch.tensor(frames, dtype=torch.long)
    uncond_ids = torch.tensor(uncond_frames, dtype=torch.long)
    attn = torch.ones_like(input_ids)
    attn[:, :2] = 0
    uncond_attn = torch.ones_like(uncond_ids)
    uncond_attn[:, :4] = 0

    # Deterministic t2i: argmax instead of multinomial, temperature 0.
    real_multinomial = torch.multinomial

    def argmax_multinomial(probs, num_samples, generator=None):
        assert num_samples == 1
        return probs.argmax(dim=-1, keepdim=True)

    torch.multinomial = argmax_multinomial
    try:
        outs = {}
        for gs in (0.0, 2.0):
            with torch.no_grad():
                out = model.t2i_generate(
                    input_ids=input_ids.clone(),
                    uncond_input_ids=uncond_ids.clone() if gs > 0 else None,
                    attention_mask=attn.clone(),
                    uncond_attention_mask=uncond_attn.clone() if gs > 0 else None,
                    temperature=0.0,
                    timesteps=6,
                    guidance_scale=gs,
                    uni_prompting=_FakeUniPrompting(),
                    seq_len=n_img,
                    mask_token_id=MASK_ID,
                    resolution=prompt_len - 1,  # prefix len = resolution+1
                    codebook_size=CODEBOOK,
                )
            outs[f"out_gs{gs}"] = out.numpy()
    finally:
        torch.multinomial = real_multinomial

    state = state_to_numpy(model)
    save(
        "t2i_generate",
        input_ids=input_ids.numpy(),
        uncond_ids=uncond_ids.numpy(),
        attn=attn.numpy(),
        uncond_attn=uncond_attn.numpy(),
        **outs,
        **{f"w::{k}": v for k, v in state.items()},
    )


def _stub_diffusers():
    """modeling_utils.py imports ~20 diffusers symbols at module level; only
    ConfigMixin/register_to_config are exercised when instantiating the
    VQGAN classes directly. Stub the rest as inert placeholders."""
    if "diffusers" in sys.modules:
        return
    d = types.ModuleType("diffusers")
    d.__version__ = "0.0.0-stub"

    utils = types.ModuleType("diffusers.utils")
    for name in [
        "FLAX_WEIGHTS_NAME", "SAFE_WEIGHTS_INDEX_NAME", "WEIGHTS_INDEX_NAME",
    ]:
        setattr(utils, name, name.lower())
    for name in [
        "_add_variant", "_get_checkpoint_shard_files", "_get_model_file",
        "deprecate", "is_accelerate_available", "is_torch_version",
    ]:
        setattr(utils, name, lambda *a, **k: False)
    import logging as _logging

    class _Logging:
        @staticmethod
        def get_logger(name):
            return _logging.getLogger(name)

    utils.logging = _Logging()

    hub_utils = types.ModuleType("diffusers.utils.hub_utils")

    class PushToHubMixin:
        pass

    hub_utils.PushToHubMixin = PushToHubMixin
    hub_utils.load_or_create_model_card = lambda *a, **k: None
    hub_utils.populate_model_card = lambda *a, **k: None

    mlu = types.ModuleType("diffusers.models.model_loading_utils")
    for name in [
        "_determine_device_map", "_fetch_index_file",
        "_load_state_dict_into_model", "load_model_dict_into_meta",
        "_fetch_index_file_legacy", "load_state_dict",
    ]:
        setattr(mlu, name, lambda *a, **k: None)
    models_pkg = types.ModuleType("diffusers.models")
    models_pkg.model_loading_utils = mlu

    cu = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        def register_to_config(self, **kwargs):
            self._internal_dict = kwargs

    def register_to_config(init):
        import functools

        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            init(self, *args, **kwargs)

        return wrapped

    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config

    quant = types.ModuleType("diffusers.quantizers")
    quant.DiffusersAutoQuantizer = object
    base = types.ModuleType("diffusers.quantizers.base")
    base.DiffusersQuantizer = object

    oc = types.ModuleType("omegaconf")

    class OmegaConf:
        pass

    oc.OmegaConf = OmegaConf
    oc.DictConfig = dict
    sys.modules.setdefault("omegaconf", oc)

    sys.modules.update({
        "diffusers": d,
        "diffusers.utils": utils,
        "diffusers.utils.hub_utils": hub_utils,
        "diffusers.models": models_pkg,
        "diffusers.models.model_loading_utils": mlu,
        "diffusers.configuration_utils": cu,
        "diffusers.quantizers": quant,
        "diffusers.quantizers.base": base,
    })


def golden_magvit():
    _stub_diffusers()
    mg = _ref("modeling_magvitv2")

    torch.manual_seed(0)
    # ch=32 keeps GroupNorm(32) valid at every width
    kw = dict(
        ch=32, num_res_blocks=[2, 2], attn_resolutions=[8],
        dropout=0.0, in_ch=3, out_ch=3, resolution=16, z_channels=5,
        double_z=False,
    )
    encoder = mg.VQGANEncoder(ch_mult=[1, 2], **kw)
    decoder = mg.VQGANDecoder(ch_mult=[1, 2], **kw)
    quantizer = mg.LFQuantizer(codebook_dim=5)
    encoder.eval(), decoder.eval()

    rng = np.random.default_rng(11)
    pixels = rng.uniform(-1, 1, size=(2, 3, 16, 16)).astype(np.float32)
    px = torch.tensor(pixels)
    with torch.no_grad():
        h = encoder(px)
        zq = quantizer(h)["z"]
        codes = quantizer.get_indices(zq).reshape(px.shape[0], -1)
        z_entry = quantizer.get_codebook_entry(codes)
        recon = decoder(z_entry)["output"]

    save(
        "magvit_tiny",
        pixels=pixels,
        latents=h.numpy(),
        codes=codes.numpy(),
        z_entry=z_entry.numpy(),
        recon=recon.numpy(),
        **{f"we::{k}": v.detach().float().numpy() for k, v in encoder.state_dict().items()},
        **{f"wd::{k}": v.detach().float().numpy() for k, v in decoder.state_dict().items()},
    )


MOTION_VOCAB = 8
MOTION_OFFSET = TEXT_LEN + CODEBOOK  # 80
SOM, EOM, T2M = 13, 14, 15


class _FakeUniPromptingT2M:
    text_tokenizer = _FakeTokenizer()
    sptids_dict = {
        "<|som|>": torch.tensor([SOM]),
        "<|eom|>": torch.tensor([EOM]),
    }


def golden_t2m():
    ours = _ref("modelling_ours")
    ModelConfig = _ref("configuration_llada").ModelConfig
    import dataclasses as _dc

    base_kwargs = {f.name: getattr(ModelConfig(), f.name) for f in _dc.fields(ModelConfig)}
    for k in ["d_model", "n_heads", "n_layers", "mlp_hidden_size", "vocab_size",
              "embedding_size", "max_sequence_length", "rope", "rope_theta",
              "attention_dropout", "residual_dropout", "embedding_dropout",
              "layer_norm_type", "activation_type", "block_type", "weight_tying",
              "include_bias", "include_qkv_bias", "alibi", "flash_attention",
              "mask_token_id", "pad_token_id", "eos_token_id", "bos_token_id"]:
        base_kwargs.pop(k, None)

    torch.manual_seed(0)
    cfg = ours.MMadaConfig(
        **base_kwargs,
        d_model=64, n_heads=4, n_layers=2, mlp_hidden_size=128,
        vocab_size=VOCAB, embedding_size=VOCAB, max_sequence_length=128,
        rope=True, rope_theta=10000.0,
        attention_dropout=0.0, residual_dropout=0.0, embedding_dropout=0.0,
        layer_norm_type="rms", activation_type="silu", block_type="llama",
        weight_tying=False, include_bias=False, include_qkv_bias=False,
        alibi=False, flash_attention=False,
        mask_token_id=MASK_ID, pad_token_id=PAD, eos_token_id=EOS,
        bos_token_id=BOS,
        llm_vocab_size=TEXT_LEN, codebook_size=CODEBOOK,
        motion_vocab_size=MOTION_VOCAB, num_vq_tokens=16,
        use_cache=False,
    )
    model = ours.MMadaModelLM(cfg, init_params=True)
    model.eval()
    with torch.no_grad():
        for p in model.parameters():
            if p.ndim >= 2:
                p.normal_(0.0, 0.05)

    n_motion = 8
    rng = np.random.default_rng(5)
    words = rng.integers(16, TEXT_LEN, size=(2, 3))
    frames = []
    for b in range(2):
        text = [PAD, PAD, T2M, BOS, *words[b].tolist(), EOS]
        frames.append(text + [SOM] + [MASK_ID] * n_motion + [EOM])
    input_ids = torch.tensor(frames, dtype=torch.long)

    real_multinomial = torch.multinomial

    def argmax_multinomial(probs, num_samples, generator=None):
        return probs.argmax(dim=-1, keepdim=True)

    torch.multinomial = argmax_multinomial
    try:
        work = input_ids.clone()
        with torch.no_grad():
            raw = model.t2m_generate(
                input_ids=work,
                attention_mask=None,
                temperature=0.0,
                timesteps=5,
                uni_prompting=_FakeUniPromptingT2M(),
                seq_len=n_motion,
                mask_token_id=MASK_ID,
                motion_vocab_size=MOTION_VOCAB,
                image_codebook_size=CODEBOOK,
            )
    finally:
        torch.multinomial = real_multinomial

    # committed motion tokens live in the mutated input_ids span (offset space)
    committed = work[:, -n_motion - 1:-1] - MOTION_OFFSET
    state = state_to_numpy(model)
    save(
        "t2m_generate",
        input_ids=input_ids.numpy(),
        out_raw=raw.numpy(),
        out_committed=committed.numpy(),
        **{f"w::{k}": v for k, v in state.items()},
    )


def golden_motion_vq():
    """Tiny motion VQ-VAE encoder/decoder forward goldens
    (motion_vqvae/models/encdec.py; no package __init__ so modules import
    via the repo root on sys.path)."""
    from motion_vqvae.models.encdec import Encoder, Decoder

    torch.manual_seed(0)
    kw = dict(
        input_emb_width=8, output_emb_width=16, down_t=2, stride_t=2,
        width=16, depth=2, dilation_growth_rate=2, activation="relu",
        norm=None,
    )
    enc = Encoder(**kw).eval()
    dec = Decoder(**kw).eval()

    rng = np.random.default_rng(21)
    motion = rng.normal(size=(2, 8, 16)).astype(np.float32)  # NCT
    with torch.no_grad():
        z = enc(torch.tensor(motion))
        recon = dec(z)
    save(
        "motion_vq",
        motion=motion,
        latents=z.numpy(),
        recon=recon.numpy(),
        **{f"we::{k}": v.detach().numpy() for k, v in enc.state_dict().items()},
        **{f"wd::{k}": v.detach().numpy() for k, v in dec.state_dict().items()},
    )


def golden_motion_quantizers():
    """All four codebook variants (motion_vqvae/models/quantize_cnn.py):
    QuantizeEMAReset (:6-124), Quantizer (:127-189), QuantizeReset
    (:193-298), QuantizeEMA (:301-413). The batch is sized N*T >= nb_code so
    `_tile` takes its deterministic no-noise branch — updates are then exact
    functions of the inputs and compare bit-close."""
    from motion_vqvae.models import quantize_cnn

    # the reference hardcodes .cuda() in reset_codebook; run on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self

    nb_code, code_dim = 12, 6
    n, t = 4, 4  # N*T = 16 >= nb_code -> deterministic seeding

    class _Args:
        pass

    args = _Args()
    args.model = _Args()
    args.model.motion_vq_model = _Args()
    args.model.motion_vq_model.mu = 0.99

    rng = np.random.default_rng(33)
    x1 = rng.normal(size=(n, code_dim, t)).astype(np.float32)  # NCT
    x2 = rng.normal(size=(n, code_dim, t)).astype(np.float32)

    out = {"x1": x1, "x2": x2}
    for name, q in (
        ("ema_reset", quantize_cnn.QuantizeEMAReset(nb_code, code_dim, args)),
        ("ema", quantize_cnn.QuantizeEMA(nb_code, code_dim, args)),
        ("reset", quantize_cnn.QuantizeReset(nb_code, code_dim, args)),
    ):
        q.train()
        xd1, commit1, ppl1 = q(torch.tensor(x1))   # init + update
        cb1 = (q.codebook.data if isinstance(q.codebook, torch.nn.Parameter)
               else q.codebook).clone()
        xd2, commit2, ppl2 = q(torch.tensor(x2))   # steady-state update
        cb2 = (q.codebook.data if isinstance(q.codebook, torch.nn.Parameter)
               else q.codebook).clone()
        out.update({
            f"{name}::xd1": xd1.detach().numpy(),
            f"{name}::commit1": commit1.detach().numpy(),
            f"{name}::ppl1": ppl1.detach().numpy(),
            f"{name}::codebook1": cb1.numpy(),
            f"{name}::xd2": xd2.detach().numpy(),
            f"{name}::commit2": commit2.detach().numpy(),
            f"{name}::ppl2": ppl2.detach().numpy(),
            f"{name}::codebook2": cb2.numpy(),
        })

    torch.manual_seed(7)
    gq = quantize_cnn.Quantizer(nb_code, code_dim, beta=1.0).train()
    zq, loss, ppl = gq(torch.tensor(x1))
    out.update({
        "gradient::embedding": gq.embedding.weight.detach().numpy(),
        "gradient::zq": zq.detach().numpy(),
        "gradient::loss": loss.detach().numpy(),
        "gradient::ppl": ppl.detach().numpy(),
    })
    save("motion_quantizers", **out)


def golden_smplify_losses():
    """SMPLify-3D loss math goldens (visualize/joints2smpl/src/customloss.py
    gmof/angle_prior/camera_fitting_loss_3d/body_fitting_loss_3d and
    prior.py MaxMixturePrior merged log-likelihood with a synthetic GMM —
    the MPG assets never enter; only the math is pinned)."""
    import pickle
    import tempfile

    from visualize.joints2smpl.src import customloss, prior

    rng = np.random.default_rng(44)
    out = {}

    x = rng.normal(size=(2, 22, 3)).astype(np.float32)
    out["gmof_in"] = x
    out["gmof"] = customloss.gmof(torch.tensor(x), 100.0).numpy()

    body_pose = rng.normal(scale=0.4, size=(2, 69)).astype(np.float32)
    out["body_pose"] = body_pose
    out["angle_prior"] = customloss.angle_prior(torch.tensor(body_pose)).numpy()

    model_joints = rng.normal(size=(2, 22, 3)).astype(np.float32)
    j3d = rng.normal(size=(2, 22, 3)).astype(np.float32)
    cam = rng.normal(scale=0.1, size=(2, 1, 3)).astype(np.float32)
    cam_est = rng.normal(scale=0.1, size=(2, 1, 3)).astype(np.float32)
    out.update(model_joints=model_joints, j3d=j3d, cam=cam, cam_est=cam_est)
    out["camera_loss"] = customloss.camera_fitting_loss_3d(
        torch.tensor(model_joints), torch.tensor(cam), torch.tensor(cam_est),
        torch.tensor(j3d), joints_category="AMASS",
    ).numpy()

    # synthetic 4-component GMM in the SMPLify pickle format
    n, d = 4, 69
    means = rng.normal(scale=0.3, size=(n, d)).astype(np.float64)
    covs = []
    for _ in range(n):
        a = rng.normal(scale=0.05, size=(d, d))
        covs.append(np.eye(d) + a @ a.T)
    covars = np.stack(covs)
    weights = rng.dirichlet(np.ones(n))
    out.update(gmm_means=means.astype(np.float32),
               gmm_covars=covars.astype(np.float32),
               gmm_weights=weights.astype(np.float32))
    with tempfile.TemporaryDirectory() as tmp:
        with open(os.path.join(tmp, "gmm_04.pkl"), "wb") as f:
            pickle.dump(
                {"means": means, "covars": covars, "weights": weights}, f
            )
        gmm = prior.MaxMixturePrior(prior_folder=tmp, num_gaussians=4,
                                    dtype=torch.float32)
    out["gmm_nll"] = gmm(torch.tensor(body_pose),
                         torch.zeros(2, 10)).detach().numpy()

    preserve = rng.normal(scale=0.4, size=(2, 69)).astype(np.float32)
    conf = np.ones(22, np.float32)
    out["preserve_pose"] = preserve
    betas = rng.normal(scale=0.5, size=(2, 10)).astype(np.float32)
    out["betas"] = betas
    out["body_loss"] = customloss.body_fitting_loss_3d(
        torch.tensor(body_pose), torch.tensor(preserve),
        torch.tensor(betas), torch.tensor(model_joints), torch.tensor(cam),
        torch.tensor(j3d), gmm, joints3d_conf=torch.tensor(conf),
        joint_loss_weight=600.0, pose_preserve_weight=5.0,
    ).detach().numpy()
    save("smplify_losses", **out)


def golden_t2m_evaluator():
    """Tiny evaluator models (models/modules.py) + metric functions
    (utils/eval_trans.py) golden outputs."""
    modules = _ref("modules")
    TextEncoderBiGRUCo = modules.TextEncoderBiGRUCo
    MotionEncoderBiGRUCo = modules.MotionEncoderBiGRUCo
    MovementConvEncoder = modules.MovementConvEncoder

    torch.manual_seed(0)
    word_size, pos_size, hidden, out = 12, 5, 8, 6
    text_enc = TextEncoderBiGRUCo(word_size, pos_size, hidden, out, "cpu").eval()
    motion_enc = MotionEncoderBiGRUCo(10, hidden, out, "cpu").eval()
    move_enc = MovementConvEncoder(7, 9, 10).eval()

    rng = np.random.default_rng(9)
    b, t = 3, 12
    word_embs = rng.normal(size=(b, t, word_size)).astype(np.float32)
    pos_onehot = rng.normal(size=(b, t, pos_size)).astype(np.float32)
    cap_lens = np.array([12, 9, 5])
    motions = rng.normal(size=(b, 16, 11)).astype(np.float32)  # raw: 7 + 4
    m_lens = np.array([16, 12, 8])

    with torch.no_grad():
        text_emb = text_enc(
            torch.tensor(word_embs), torch.tensor(pos_onehot),
            torch.tensor(cap_lens),
        )
        move = move_enc(torch.tensor(motions[..., :-4]))
        motion_emb = motion_enc(move, torch.tensor(m_lens // 4))

    # metric goldens from the reference formulas. utils/eval_trans.py
    # imports `clip` (absent here), so execute just the pure-numpy metric
    # functions from its source.
    import scipy.linalg as _linalg

    src = open(os.path.join(REFERENCE, "utils", "eval_trans.py")).read()
    start = src.index("def euclidean_distance_matrix")
    end = src.index("def calculate_activation_statistics")
    end = src.index("\n", src.index("return mu, cov", end))
    ns = {"np": np, "linalg": _linalg}
    exec(src[start:end], ns)  # noqa: S102 - reference-side golden generation

    class eval_trans:
        calculate_R_precision = staticmethod(ns["calculate_R_precision"])
        calculate_activation_statistics = staticmethod(
            ns["calculate_activation_statistics"]
        )
        calculate_frechet_distance = staticmethod(ns["calculate_frechet_distance"])

    e1 = rng.normal(size=(8, 6)).astype(np.float64)
    e2 = rng.normal(size=(8, 6)).astype(np.float64)
    top_k_mat, matching = eval_trans.calculate_R_precision(e1, e2, 3)
    mu1, s1 = eval_trans.calculate_activation_statistics(
        rng.normal(size=(50, 6))
    )
    mu2, s2 = eval_trans.calculate_activation_statistics(
        rng.normal(size=(50, 6)) + 0.5
    )
    fid = eval_trans.calculate_frechet_distance(mu1, s1, mu2, s2)

    save(
        "t2m_evaluator",
        word_embs=word_embs, pos_onehot=pos_onehot, cap_lens=cap_lens,
        motions=motions, m_lens=m_lens,
        text_emb=text_emb.numpy(), motion_emb=motion_emb.numpy(),
        move_feats=move.numpy(),
        rp_e1=e1, rp_e2=e2, rp_topk=top_k_mat, rp_matching=np.array(matching),
        fid_mu1=mu1, fid_s1=s1, fid_mu2=mu2, fid_s2=s2, fid=np.array(fid),
        **{f"wt::{k}": v.detach().numpy() for k, v in text_enc.state_dict().items()},
        **{f"wm::{k}": v.detach().numpy() for k, v in motion_enc.state_dict().items()},
        **{f"wv::{k}": v.detach().numpy() for k, v in move_enc.state_dict().items()},
    )


if __name__ == "__main__":
    golden_forward()
    golden_text_generate()
    golden_t2i()
    golden_magvit()
    golden_t2m()
    golden_motion_vq()
    golden_motion_quantizers()
    golden_smplify_losses()
    golden_t2m_evaluator()
    print("done")
