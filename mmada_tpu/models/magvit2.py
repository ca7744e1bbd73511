"""MAGVIT-v2 LFQ image tokenizer (VQGAN encoder / LFQ / decoder), TPU-native.

Functional-JAX rebuild of the reference tokenizer
(models/modeling_magvitv2.py, blocks from models/common_modules.py):

  * `VQGANEncoder` — conv-in, `len(ch_mult)` resolution levels of
    ResnetBlocks (+AttnBlock at configured resolutions), asymmetric-padded
    stride-2 downsampling, middle block-attn-block, GroupNorm(32)+swish,
    conv-out to `z_channels`, then a 1×1 `quant_conv`
    (modeling_magvitv2.py:48-169).
  * `LFQuantizer` — lookup-free binary quantization: `sign(z) ∈ {−1,+1}`,
    code index `Σ 2^(C−1−i)·[z_i > 0]` with the MSB in channel 0
    (:172-274). Deterministic: VQ token parity vs the reference is exact.
  * `VQGANDecoder` — mirror with nearest-neighbor 2× upsampling
    (:277-399).

TPU-native choices: NHWC layouts throughout (images enter as (B, H, W, C)),
convolutions via `lax.conv_general_dilated` with HWIO kernels so XLA maps
them straight onto the MXU, fp32 GroupNorm islands, and the whole
encode/decode is one jittable function. The flagship config tokenizes
256px → 16×16 and 512px → 32×32 codes over a 2^13 = 8192 codebook.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mmada_tpu.ops.norms import group_norm

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VQGANConfig:
    """Mirror of the reference encoder/decoder Config dataclasses
    (modeling_magvitv2.py:49-60, 279-289). Note encoder and decoder use
    *different* ch_mult / num_res_blocks in the flagship."""

    ch: int = 128
    enc_ch_mult: Sequence[int] = (1, 2, 2, 4, 4)
    enc_num_res_blocks: Sequence[int] = (4, 3, 4, 3, 4)
    dec_ch_mult: Sequence[int] = (1, 1, 2, 2, 4)
    dec_num_res_blocks: Sequence[int] = (4, 4, 3, 4, 3)
    attn_resolutions: Sequence[int] = (5,)
    in_ch: int = 3
    out_ch: int = 3
    resolution: int = 256
    z_channels: int = 13
    num_groups: int = 32

    @property
    def codebook_size(self) -> int:
        return 2 ** self.z_channels

    @property
    def num_levels(self) -> int:
        return len(self.enc_ch_mult)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (self.num_levels - 1)


def magvit2_default() -> VQGANConfig:
    """showlab/magvitv2 flagship configuration."""
    return VQGANConfig()


def tiny_vqgan(resolution: int = 16) -> VQGANConfig:
    return VQGANConfig(
        ch=32,
        enc_ch_mult=(1, 2),
        enc_num_res_blocks=(2, 2),
        dec_ch_mult=(1, 2),
        dec_num_res_blocks=(2, 2),
        attn_resolutions=(resolution // 2,),
        resolution=resolution,
        z_channels=5,
        num_groups=32,
    )


# --------------------------------------------------------------------------
# primitives
# --------------------------------------------------------------------------

def swish(x):
    return x * jax.nn.sigmoid(x)


def conv2d(x, p, stride: int = 1, padding="SAME"):
    """NHWC conv with HWIO kernel + bias."""
    out = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def _resnet_block(p, cfg, x):
    h = group_norm(x, p["norm1"]["w"], p["norm1"]["b"], cfg.num_groups)
    h = swish(h)
    h = conv2d(h, p["conv1"])
    h = group_norm(h, p["norm2"]["w"], p["norm2"]["b"], cfg.num_groups)
    h = swish(h)
    h = conv2d(h, p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"])
    return x + h


def _attn_block(p, cfg, x):
    """Single-head conv attention over spatial positions
    (common_modules.py:168-211)."""
    b, h, w, c = x.shape
    hn = group_norm(x, p["norm"]["w"], p["norm"]["b"], cfg.num_groups)
    q = conv2d(hn, p["q"]).reshape(b, h * w, c)
    k = conv2d(hn, p["k"]).reshape(b, h * w, c)
    v = conv2d(hn, p["v"]).reshape(b, h * w, c)
    scores = jnp.einsum(
        "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
    ) * (c ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
    return x + conv2d(out, p["proj_out"])


def _downsample(p, x):
    # asymmetric (0,1,0,1) pad then stride-2 valid conv
    # (common_modules.py:73-90)
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(x, p["conv"], stride=2, padding="VALID")


def _upsample(p, x):
    b, h, w, c = x.shape
    x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
    return conv2d(x, p["conv"])


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _init_conv(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def _init_norm(c, dtype):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _init_resnet(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": _init_norm(cin, dtype),
        "conv1": _init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": _init_norm(cout, dtype),
        "conv2": _init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = _init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def _init_attn(key, c, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm": _init_norm(c, dtype),
        "q": _init_conv(ks[0], 1, 1, c, c, dtype),
        "k": _init_conv(ks[1], 1, 1, c, c, dtype),
        "v": _init_conv(ks[2], 1, 1, c, c, dtype),
        "proj_out": _init_conv(ks[3], 1, 1, c, c, dtype),
    }


def _level_plan(cfg: VQGANConfig, ch_mult, num_res_blocks, encoder: bool):
    """Yield (level, block_in, block_out, curr_res) following the reference
    channel bookkeeping."""
    plans = []
    if encoder:
        curr_res = cfg.resolution
        in_mult = (1,) + tuple(ch_mult)
        for i in range(len(ch_mult)):
            plans.append(
                (i, cfg.ch * in_mult[i], cfg.ch * ch_mult[i], curr_res)
            )
            if i != len(ch_mult) - 1:
                curr_res //= 2
    else:
        curr_res = cfg.resolution // 2 ** (len(ch_mult) - 1)
        block_in = cfg.ch * ch_mult[-1]
        for i in reversed(range(len(ch_mult))):
            plans.append((i, block_in, cfg.ch * ch_mult[i], curr_res))
            block_in = cfg.ch * ch_mult[i]
            if i != 0:
                curr_res *= 2
        plans = plans  # decoder order: high level -> 0
    return plans


def init_encoder(key, cfg: VQGANConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 1024))
    p: Params = {"conv_in": _init_conv(next(keys), 3, 3, cfg.in_ch, cfg.ch, dtype)}
    down = []
    for i, block_in, block_out, curr_res in _level_plan(
        cfg, cfg.enc_ch_mult, cfg.enc_num_res_blocks, encoder=True
    ):
        level: Params = {"block": [], "attn": []}
        cin = block_in
        for _ in range(cfg.enc_num_res_blocks[i]):
            level["block"].append(_init_resnet(next(keys), cin, block_out, dtype))
            cin = block_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(_init_attn(next(keys), cin, dtype))
        if i != cfg.num_levels - 1:
            level["downsample"] = {
                "conv": _init_conv(next(keys), 3, 3, cin, cin, dtype)
            }
        down.append(level)
    p["down"] = down
    block_in = cfg.ch * cfg.enc_ch_mult[-1]
    p["mid"] = {
        "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
        "attn_1": _init_attn(next(keys), block_in, dtype),
        "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
    }
    p["norm_out"] = _init_norm(block_in, dtype)
    p["conv_out"] = _init_conv(next(keys), 3, 3, block_in, cfg.z_channels, dtype)
    p["quant_conv"] = _init_conv(next(keys), 1, 1, cfg.z_channels, cfg.z_channels, dtype)
    return p


def init_decoder(key, cfg: VQGANConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 1024))
    block_in = cfg.ch * cfg.dec_ch_mult[-1]
    p: Params = {
        "post_quant_conv": _init_conv(next(keys), 1, 1, cfg.z_channels, cfg.z_channels, dtype),
        "conv_in": _init_conv(next(keys), 3, 3, cfg.z_channels, block_in, dtype),
        "mid": {
            "block_1": _init_resnet(next(keys), block_in, block_in, dtype),
            "attn_1": _init_attn(next(keys), block_in, dtype),
            "block_2": _init_resnet(next(keys), block_in, block_in, dtype),
        },
    }
    up: list = [None] * len(cfg.dec_ch_mult)
    final_in = block_in
    for i, blk_in, blk_out, curr_res in _level_plan(
        cfg, cfg.dec_ch_mult, cfg.dec_num_res_blocks, encoder=False
    ):
        level: Params = {"block": [], "attn": []}
        cin = blk_in
        for _ in range(cfg.dec_num_res_blocks[i]):
            level["block"].append(_init_resnet(next(keys), cin, blk_out, dtype))
            cin = blk_out
            if curr_res in cfg.attn_resolutions:
                level["attn"].append(_init_attn(next(keys), cin, dtype))
        if i != 0:
            level["upsample"] = {"conv": _init_conv(next(keys), 3, 3, cin, cin, dtype)}
        up[i] = level
        final_in = cin if i == 0 else final_in
    p["up"] = up
    p["norm_out"] = _init_norm(cfg.ch * cfg.dec_ch_mult[0], dtype)
    p["conv_out"] = _init_conv(next(keys), 3, 3, cfg.ch * cfg.dec_ch_mult[0], cfg.out_ch, dtype)
    return p


def init_magvit2(key, cfg: VQGANConfig, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"encoder": init_encoder(k1, cfg, dtype), "decoder": init_decoder(k2, cfg, dtype)}


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def encoder_forward(p: Params, cfg: VQGANConfig, x: jax.Array) -> jax.Array:
    """(B, H, W, in_ch) pixels in [-1, 1] -> (B, h, w, z_channels) latents."""
    h = conv2d(x, p["conv_in"])
    curr_res = cfg.resolution
    for i in range(cfg.num_levels):
        level = p["down"][i]
        for j in range(cfg.enc_num_res_blocks[i]):
            h = _resnet_block(level["block"][j], cfg, h)
            if level["attn"]:
                h = _attn_block(level["attn"][j], cfg, h)
        if i != cfg.num_levels - 1:
            h = _downsample(level["downsample"], h)
            curr_res //= 2
    h = _resnet_block(p["mid"]["block_1"], cfg, h)
    h = _attn_block(p["mid"]["attn_1"], cfg, h)
    h = _resnet_block(p["mid"]["block_2"], cfg, h)
    h = group_norm(h, p["norm_out"]["w"], p["norm_out"]["b"], cfg.num_groups)
    h = swish(h)
    h = conv2d(h, p["conv_out"])
    h = conv2d(h, p["quant_conv"])
    return h


def decoder_forward(p: Params, cfg: VQGANConfig, z: jax.Array) -> jax.Array:
    """(B, h, w, z_channels) quantized latents -> (B, H, W, out_ch) pixels."""
    z = conv2d(z, p["post_quant_conv"])
    h = conv2d(z, p["conv_in"])
    h = _resnet_block(p["mid"]["block_1"], cfg, h)
    h = _attn_block(p["mid"]["attn_1"], cfg, h)
    h = _resnet_block(p["mid"]["block_2"], cfg, h)
    for i in reversed(range(len(cfg.dec_ch_mult))):
        level = p["up"][i]
        for j in range(cfg.dec_num_res_blocks[i]):
            h = _resnet_block(level["block"][j], cfg, h)
            if level["attn"]:
                h = _attn_block(level["attn"][j], cfg, h)
        if i != 0:
            h = _upsample(level["upsample"], h)
    h = group_norm(h, p["norm_out"]["w"], p["norm_out"]["b"], cfg.num_groups)
    h = swish(h)
    return conv2d(h, p["conv_out"])


# --------------------------------------------------------------------------
# LFQ — lookup-free quantization (deterministic, bit-exact vs reference)
# --------------------------------------------------------------------------

def lfq_quantize(z: jax.Array) -> jax.Array:
    """sign(z): strictly positive -> +1, else -1 (modeling_magvitv2.py:238-241)."""
    return jnp.where(z > 0, 1.0, -1.0).astype(z.dtype)


def lfq_indices(z: jax.Array, z_channels: int) -> jax.Array:
    """(B, h, w, C) latents -> (B, h*w) codes; channel 0 is the MSB
    (power_vals = 2^[C-1..0], modeling_magvitv2.py:196-206)."""
    b = z.shape[0]
    powers = 2 ** jnp.arange(z_channels - 1, -1, -1, dtype=jnp.int32)
    bits = (z > 0).astype(jnp.int32)
    codes = jnp.tensordot(bits, powers, axes=([-1], [0]))
    return codes.reshape(b, -1)


def lfq_codebook_entry(
    indices: jax.Array, z_channels: int, shape: Optional[tuple[int, int]] = None
) -> jax.Array:
    """(B, N) codes -> (B, h, w, C) ±1 latents (modeling_magvitv2.py:208-220)."""
    b, n = indices.shape
    if shape is None:
        hw = int(round(float(np.sqrt(n))))
        shape = (hw, hw)
    shifts = jnp.arange(z_channels - 1, -1, -1, dtype=indices.dtype)
    bits = (indices[..., None] >> shifts) & 1
    z = bits.astype(jnp.float32) * 2.0 - 1.0
    return z.reshape(b, shape[0], shape[1], z_channels)


def lfq_losses(z: jax.Array, beta: float = 0.25) -> dict[str, jax.Array]:
    """Training losses for the LFQ bottleneck (modeling_magvitv2.py:246-263):
    per-sample binary entropy (minimized), batch mean-prob entropy
    (maximized), and the two-sided commit loss."""
    zf = z.astype(jnp.float32).reshape(-1, z.shape[-1])
    zq = jnp.where(zf > 0, 1.0, -1.0)
    logit_pos = -jnp.square(zf - 1.0)
    logit_neg = -jnp.square(zf + 1.0)
    logits = jnp.stack([logit_pos, logit_neg], axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    probs = jnp.exp(logp)
    entropy = -jnp.sum(probs * logp, axis=-1).mean()
    mean_prob = probs.mean(axis=0)
    mean_entropy = -jnp.sum(
        mean_prob * jnp.log(jnp.clip(mean_prob, 1e-20)), axis=-1
    ).mean()
    # two-sided commit with reference gradient structure
    # (modeling_magvitv2.py:259-263): encoder pulled by the first term,
    # straight-through side scaled by beta
    zq_ste = zf + jax.lax.stop_gradient(zq - zf)
    commit = (
        jnp.mean(jnp.square(jax.lax.stop_gradient(zq) - zf))
        + beta * jnp.mean(jnp.square(zq_ste - jax.lax.stop_gradient(zf)))
    )
    return {
        "entropy_loss": entropy - mean_entropy,
        "commit_loss": commit,
    }


# --------------------------------------------------------------------------
# top-level tokenizer API (reference MAGVITv2 wrapper, :402-433)
# --------------------------------------------------------------------------

def get_code(params: Params, cfg: VQGANConfig, pixels: jax.Array) -> jax.Array:
    """pixels (B, H, W, C) in [-1, 1] -> VQ codes (B, N).
    Parity target: bit-identical to `MAGVITv2.get_code`
    (modeling_magvitv2.py:423-427)."""
    h = encoder_forward(params["encoder"], cfg, pixels)
    return lfq_indices(h, cfg.z_channels)


def decode_code(
    params: Params, cfg: VQGANConfig, codes: jax.Array,
    shape: Optional[tuple[int, int]] = None,
) -> jax.Array:
    """VQ codes (B, N) -> reconstructed pixels (B, H, W, C)
    (`MAGVITv2.decode_code`, modeling_magvitv2.py:429-433)."""
    z = lfq_codebook_entry(codes, cfg.z_channels, shape)
    return decoder_forward(params["decoder"], cfg, z)


def encode(params: Params, cfg: VQGANConfig, pixels: jax.Array):
    h = encoder_forward(params["encoder"], cfg, pixels)
    zq = lfq_quantize(h)
    return zq, lfq_indices(h, cfg.z_channels)
