"""Motion VQ-VAE: 1-D conv encoder/decoder + EMA-reset codebook, TPU-native.

Functional-JAX rebuild of the reference motion tokenizer
(motion_vqvae/models/): `Encoder`/`Decoder` (encdec.py:4-66) are stride-2
1-D conv stacks with dilated `Resnet1D` blocks (resnet.py); the default
quantizer is `QuantizeEMAReset` (quantize_cnn.py:6-124) — nearest-neighbor
assignment, EMA codebook updates, dead codes re-seeded from batch samples.
Flagship config: nb_code 512, code_dim 512, down_t 2
(options/option_vq.py:26-33), so 4 motion frames per token.

TPU-native: NTC ("channels-last") layout, convolutions via
`lax.conv_general_dilated` dimension numbers ('NTC','TIO','NTC'), codebook
state is explicit (pytree in / pytree out — no hidden buffers), and both
encode and the EMA update are jittable. Pose features enter as
`(B, T, pose_dim)` float32 (reference is `(B, pose_dim, T)`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MotionVQConfig:
    pose_dim: int = 263            # HumanML3D feature width
    code_dim: int = 512
    nb_code: int = 512
    width: int = 512
    down_t: int = 2
    stride_t: int = 2
    depth: int = 3
    dilation_growth_rate: int = 3
    activation: str = "relu"
    mu: float = 0.99               # EMA decay
    quantizer: str = "ema_reset"
    """Codebook variant (reference motion_vqvae/models/quantize_cnn.py):
      * 'ema_reset' — EMA updates + dead-code reset (QuantizeEMAReset:6-124,
        the flagship default);
      * 'ema'       — EMA updates, no reset (QuantizeEMA:301-413);
      * 'reset'     — gradient-free codebook, codes unused in the current
        batch reseeded from batch vectors (QuantizeReset:193-298);
      * 'gradient'  — optimizer-trained codebook with the classic VQ loss
        (Quantizer:127-189); requires the codebook in the optimizer."""
    beta: float = 1.0              # 'gradient' commitment weight


def tiny_motion_cfg() -> MotionVQConfig:
    return MotionVQConfig(
        pose_dim=8, code_dim=16, nb_code=32, width=16, down_t=2, depth=2,
        dilation_growth_rate=2,
    )


# --------------------------------------------------------------------------
# conv primitives (NTC layout)
# --------------------------------------------------------------------------

def conv1d(x, p, stride: int = 1, dilation: int = 1, padding: int = 0):
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return out + p["b"].astype(x.dtype)


def _act(name: str, x):
    if name == "relu":
        return jax.nn.relu(x)
    if name == "silu":
        return x * jax.nn.sigmoid(x)
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(name)


def _init_conv1d(key, k, cin, cout, dtype=jnp.float32):
    fan_in = k * cin
    bound = float(np.sqrt(1.0 / fan_in))
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (k, cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _res_block(p, cfg, x, dilation: int):
    """ResConv1DBlock (resnet.py:24-67), norm=None variant (the flagship
    uses no norm): act → dilated 3-conv → act → 1-conv, residual."""
    h = _act(cfg.activation, x)
    h = conv1d(h, p["conv1"], dilation=dilation, padding=dilation)
    h = _act(cfg.activation, h)
    h = conv1d(h, p["conv2"])
    return x + h


def _resnet1d(p, cfg, x, reverse: bool):
    dilations = [cfg.dilation_growth_rate ** d for d in range(cfg.depth)]
    if reverse:
        dilations = dilations[::-1]
    for block_p, dil in zip(p, dilations):
        x = _res_block(block_p, cfg, x, dil)
    return x


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _init_resnet1d(key, cfg, dtype):
    keys = jax.random.split(key, cfg.depth)
    return [
        {
            "conv1": _init_conv1d(jax.random.fold_in(k, 0), 3, cfg.width, cfg.width, dtype),
            "conv2": _init_conv1d(jax.random.fold_in(k, 1), 1, cfg.width, cfg.width, dtype),
        }
        for k in keys
    ]


def init_encoder(key, cfg: MotionVQConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    filt = cfg.stride_t * 2
    p: Params = {
        "conv_in": _init_conv1d(next(keys), 3, cfg.pose_dim, cfg.width, dtype),
        "down": [
            {
                "conv": _init_conv1d(next(keys), filt, cfg.width, cfg.width, dtype),
                "resnet": _init_resnet1d(next(keys), cfg, dtype),
            }
            for _ in range(cfg.down_t)
        ],
        "conv_out": _init_conv1d(next(keys), 3, cfg.width, cfg.code_dim, dtype),
    }
    return p


def init_decoder(key, cfg: MotionVQConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 64))
    p: Params = {
        "conv_in": _init_conv1d(next(keys), 3, cfg.code_dim, cfg.width, dtype),
        "up": [
            {
                "resnet": _init_resnet1d(next(keys), cfg, dtype),
                "conv": _init_conv1d(next(keys), 3, cfg.width, cfg.width, dtype),
            }
            for _ in range(cfg.down_t)
        ],
        "conv_mid": _init_conv1d(next(keys), 3, cfg.width, cfg.width, dtype),
        "conv_out": _init_conv1d(next(keys), 3, cfg.width, cfg.pose_dim, dtype),
    }
    return p


def init_motion_vq(key, cfg: MotionVQConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    if cfg.quantizer == "gradient":
        # nn.Embedding uniform(-1/n, 1/n) init (quantize_cnn.py:136)
        codebook = jax.random.uniform(
            k3, (cfg.nb_code, cfg.code_dim), dtype,
            -1.0 / cfg.nb_code, 1.0 / cfg.nb_code,
        )
    elif cfg.quantizer == "reset":
        # nn.Parameter(torch.randn(...)) (quantize_cnn.py:199); replaced by
        # batch seeding on the first training step
        codebook = jax.random.normal(k3, (cfg.nb_code, cfg.code_dim), dtype)
    else:  # ema / ema_reset: zeros until first-batch seeding
        codebook = jnp.zeros((cfg.nb_code, cfg.code_dim), dtype)
    return {
        "encoder": init_encoder(k1, cfg, dtype),
        "decoder": init_decoder(k2, cfg, dtype),
        "codebook": codebook,
    }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CodebookState:
    """Explicit EMA state (the reference keeps these as module buffers)."""

    code_sum: jax.Array    # (nb_code, code_dim)
    code_count: jax.Array  # (nb_code,)
    initialized: jax.Array  # () bool

    @classmethod
    def create(cls, cfg: MotionVQConfig):
        return cls(
            code_sum=jnp.zeros((cfg.nb_code, cfg.code_dim)),
            code_count=jnp.zeros((cfg.nb_code,)),
            initialized=jnp.zeros((), jnp.bool_),
        )


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def encoder_forward(p: Params, cfg: MotionVQConfig, x: jax.Array) -> jax.Array:
    """(B, T, pose_dim) -> (B, T / stride^down_t, code_dim) latents."""
    h = jax.nn.relu(conv1d(x, p["conv_in"], padding=1))
    pad = cfg.stride_t // 2
    for level in p["down"]:
        h = conv1d(h, level["conv"], stride=cfg.stride_t, padding=pad)
        # Resnet1D defaults to reverse_dilation=True in BOTH encoder and
        # decoder (encdec.py passes no reverse flag; resnet.py:71)
        h = _resnet1d(level["resnet"], cfg, h, reverse=True)
    return conv1d(h, p["conv_out"], padding=1)


def decoder_forward(p: Params, cfg: MotionVQConfig, z: jax.Array) -> jax.Array:
    """(B, t, code_dim) -> (B, T, pose_dim)."""
    h = jax.nn.relu(conv1d(z, p["conv_in"], padding=1))
    for level in p["up"]:
        h = _resnet1d(level["resnet"], cfg, h, reverse=True)
        h = jnp.repeat(h, 2, axis=1)  # nearest-neighbor 2x upsample
        h = conv1d(h, level["conv"], padding=1)
    h = jax.nn.relu(conv1d(h, p["conv_mid"], padding=1))
    return conv1d(h, p["conv_out"], padding=1)


# --------------------------------------------------------------------------
# quantizer (EMA-reset, quantize_cnn.py:6-124)
# --------------------------------------------------------------------------

def quantize(codebook: jax.Array, x_flat: jax.Array) -> jax.Array:
    """Nearest code by L2: argmin ‖x‖² − 2xW + ‖w‖²."""
    dist = (
        jnp.sum(x_flat ** 2, axis=-1, keepdims=True)
        - 2.0 * x_flat @ codebook.T
        + jnp.sum(codebook ** 2, axis=-1)[None, :]
    )
    return jnp.argmin(dist, axis=-1)


def dequantize(codebook: jax.Array, codes: jax.Array) -> jax.Array:
    return codebook[codes]


def perplexity_of(codes: jax.Array, nb_code: int) -> jax.Array:
    counts = jnp.bincount(codes.reshape(-1), length=nb_code)
    prob = counts / jnp.maximum(counts.sum(), 1)
    return jnp.exp(-jnp.sum(prob * jnp.log(prob + 1e-7)))


def _tile_to(key, x_flat: jax.Array, nb_code: int) -> jax.Array:
    """Reference `_tile` (quantize_cnn.py:20-29): repeat batch vectors up to
    nb_code rows, adding tiny noise ONLY when tiling is needed — with a
    full batch (N >= nb_code) the seed vectors are exact batch samples."""
    n, d = x_flat.shape
    if n >= nb_code:
        return x_flat[:nb_code]
    reps = (nb_code + n - 1) // n
    out = jnp.tile(x_flat, (reps, 1))[:nb_code]
    noise = jax.random.normal(key, out.shape, out.dtype) * (0.01 / np.sqrt(d))
    return out + noise


def _perplexity(code_count_batch: jax.Array, eps: float = 1e-7) -> jax.Array:
    prob = code_count_batch / jnp.maximum(code_count_batch.sum(), 1e-12)
    return jnp.exp(-jnp.sum(prob * jnp.log(prob + eps)))


def _init_codebook(key, x_flat: jax.Array, nb_code: int):
    """Shared first-batch seeding (quantize_cnn.py:31-36): codebook and EMA
    sums from batch vectors, counts at one."""
    seeded = _tile_to(key, x_flat, nb_code)
    return seeded, CodebookState(
        code_sum=seeded,
        code_count=jnp.ones((nb_code,)),
        initialized=jnp.ones((), jnp.bool_),
    )


def _apply_update(
    key: jax.Array,
    codebook: jax.Array,
    state: CodebookState,
    x_flat: jax.Array,
    codes: jax.Array,
    cfg: MotionVQConfig,
) -> tuple[jax.Array, CodebookState, jax.Array]:
    """Variant-specific unconditional codebook update:
      * ema_reset — EMA centers, dead codes (EMA count < 1) reseeded
        (quantize_cnn.py:49-73);
      * ema       — EMA centers, never reseeded (:344-363);
      * reset     — values kept verbatim for codes used THIS batch,
        unused codes reseeded from batch vectors (:233-252)."""
    nb_code = codebook.shape[0]
    mu = cfg.mu
    onehot = jax.nn.one_hot(codes, nb_code, dtype=x_flat.dtype)  # (N, K)
    code_sum_batch = onehot.T @ x_flat
    code_count_batch = onehot.sum(axis=0)
    rand = _tile_to(key, x_flat, nb_code)

    if cfg.quantizer == "reset":
        usage = (code_count_batch >= 1.0)[:, None]
        new_codebook = jnp.where(usage, codebook, rand)
        new_state = CodebookState(
            code_sum=state.code_sum, code_count=code_count_batch,
            initialized=jnp.ones((), jnp.bool_),
        )
    else:
        code_sum = mu * state.code_sum + (1 - mu) * code_sum_batch
        code_count = mu * state.code_count + (1 - mu) * code_count_batch
        update = code_sum / jnp.maximum(code_count[:, None], 1e-12)
        if cfg.quantizer == "ema":
            new_codebook = update
        else:  # ema_reset
            usage = (code_count >= 1.0)[:, None]
            new_codebook = jnp.where(usage, update, rand)
        new_state = CodebookState(
            code_sum=code_sum, code_count=code_count,
            initialized=jnp.ones((), jnp.bool_),
        )
    return new_codebook, new_state, _perplexity(code_count_batch)


def quantizer_forward(
    key: jax.Array,
    codebook: jax.Array,
    state: CodebookState,
    x_flat: jax.Array,
    cfg: MotionVQConfig,
) -> tuple[jax.Array, jax.Array, jax.Array, CodebookState, jax.Array]:
    """Training-mode quantizer pass in the reference's exact order
    (quantize_cnn.py:94-123 forward): maybe-init from the batch →
    quantize with the (possibly just-seeded) codebook → unconditional
    variant update. Returns (z_q, codes, new_codebook, new_state,
    perplexity). Not for 'gradient' (use gradient_quantizer_losses)."""
    if cfg.quantizer not in ("ema_reset", "ema", "reset"):
        raise ValueError(f"quantizer_forward does not apply to {cfg.quantizer}")
    nb_code = codebook.shape[0]
    k_init, k_update = jax.random.split(key)

    codebook, state = jax.lax.cond(
        state.initialized,
        lambda _: (codebook, state),
        lambda _: _init_codebook(k_init, x_flat, nb_code),
        None,
    )
    codes = quantize(codebook, x_flat)
    z_q = dequantize(codebook, codes)
    new_codebook, new_state, ppl = _apply_update(
        k_update, codebook, state, x_flat, codes, cfg
    )
    return z_q, codes, new_codebook, new_state, ppl


def ema_update(
    key: jax.Array,
    codebook: jax.Array,
    state: CodebookState,
    x_flat: jax.Array,
    codes: jax.Array,
    mu: float,
) -> tuple[jax.Array, CodebookState, jax.Array]:
    """One flagship-default (ema_reset) update with given codes; seeds from
    the batch when uninitialized. Prefer `quantizer_forward`, which also
    reproduces the reference's init-then-requantize first step."""
    cfg = MotionVQConfig(mu=mu, quantizer="ema_reset")
    nb_code = codebook.shape[0]
    k_init, k_update = jax.random.split(key)

    def init_branch(_):
        cb, st = _init_codebook(k_init, x_flat, nb_code)
        new_codes = quantize(cb, x_flat)
        return _apply_update(k_update, cb, st, x_flat, new_codes, cfg)

    def update_branch(_):
        return _apply_update(k_update, codebook, state, x_flat, codes, cfg)

    return jax.lax.cond(state.initialized, update_branch, init_branch, None)


def gradient_quantizer_losses(
    codebook: jax.Array, z_flat: jax.Array, beta: float = 1.0
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Optimizer-trained quantizer (`Quantizer`, quantize_cnn.py:127-165):
    loss = ‖z_q − sg(z)‖² + β‖sg(z_q) − z‖² (codebook learns through the
    first term, encoder through the second). Returns
    (z_q_ste, loss, perplexity, codes)."""
    codes = quantize(codebook, jax.lax.stop_gradient(z_flat))
    z_q = codebook[codes]
    loss = (
        jnp.mean(jnp.square(z_q - jax.lax.stop_gradient(z_flat)))
        + beta * jnp.mean(jnp.square(jax.lax.stop_gradient(z_q) - z_flat))
    )
    z_q_ste = z_flat + jax.lax.stop_gradient(z_q - z_flat)
    # reference Quantizer uses eps 1e-10 (quantize_cnn.py:163) and one-hot
    # means rather than counts — identical up to the shared normalizer
    onehot_mean = jax.nn.one_hot(codes, codebook.shape[0]).mean(axis=0)
    perplexity = jnp.exp(
        -jnp.sum(onehot_mean * jnp.log(onehot_mean + 1e-10))
    )
    return z_q_ste, loss, perplexity, codes


# --------------------------------------------------------------------------
# top-level API (HumanVQVAE, motion_vqvae/models/vqvae.py:6-117)
# --------------------------------------------------------------------------

def encode(params: Params, cfg: MotionVQConfig, motion: jax.Array) -> jax.Array:
    """(B, T, pose_dim) -> (B, t) motion VQ codes."""
    z = encoder_forward(params["encoder"], cfg, motion)
    b, t, d = z.shape
    codes = quantize(params["codebook"], z.reshape(-1, d))
    return codes.reshape(b, t)


def decode(params: Params, cfg: MotionVQConfig, codes: jax.Array) -> jax.Array:
    """(B, t) codes -> (B, T, pose_dim) motion features."""
    z = dequantize(params["codebook"], codes)
    return decoder_forward(params["decoder"], cfg, z)


def forward_train(
    key: jax.Array,
    params: Params,
    state: CodebookState,
    cfg: MotionVQConfig,
    motion: jax.Array,
):
    """Training forward: returns (recon, commit_loss, perplexity,
    new_codebook, new_state). Straight-through estimator on the bottleneck.

    For the non-gradient variants the returned codebook/state carry the
    functional update (assign them back); for `quantizer='gradient'` the
    codebook is untouched here — it learns through commit_loss (which is
    then the full two-term VQ loss) via the optimizer."""
    z = encoder_forward(params["encoder"], cfg, motion)
    b, t, d = z.shape
    z_flat = z.reshape(-1, d)
    if cfg.quantizer == "gradient":
        z_ste, commit_loss, perplexity, _ = gradient_quantizer_losses(
            params["codebook"], z_flat, beta=cfg.beta
        )
        recon = decoder_forward(params["decoder"], cfg, z_ste.reshape(b, t, d))
        return recon, commit_loss, perplexity, params["codebook"], state
    z_q, codes, new_codebook, new_state, perplexity = quantizer_forward(
        key, params["codebook"], state,
        jax.lax.stop_gradient(z_flat), cfg,
    )
    commit_loss = jnp.mean(
        jnp.square(z_flat - jax.lax.stop_gradient(z_q))
    )
    z_ste = z_flat + jax.lax.stop_gradient(z_q - z_flat)
    recon = decoder_forward(params["decoder"], cfg, z_ste.reshape(b, t, d))
    return recon, commit_loss, perplexity, new_codebook, new_state


def motion_losses(recon: jax.Array, target: jax.Array,
                  commit_loss: jax.Array, commit_weight: float = 0.02,
                  vel_weight: float = 0.5):
    """Recon + commitment + velocity losses (utils/losses.py:4-28:
    smooth-l1 on features and on frame-to-frame deltas)."""
    def smooth_l1(a, b):
        d = jnp.abs(a - b)
        return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))

    loss_recon = smooth_l1(recon, target)
    loss_vel = smooth_l1(
        recon[:, 1:] - recon[:, :-1], target[:, 1:] - target[:, :-1]
    )
    total = loss_recon + vel_weight * loss_vel + commit_weight * commit_loss
    return total, {"recon": loss_recon, "vel": loss_vel, "commit": commit_loss}
