"""Model-FLOP accounting shared by bench.py and tools/bench_train.py.

Counts matmul FLOPs only (the MXU-visible work): qkvo + gated MLP per
layer, the QK^T/PV attention einsums, and the vocab head. Elementwise ops
(norms, rope, softmax, residuals) are bandwidth, not FLOPs, and are
excluded — same convention as the scaling-book MFU definition.

The reference has no FLOP accounting at all (its only training-perf
instrument is the unpublished `samples/sec/gpu` wandb log,
training/train_mmada.py:665-674).
"""

from __future__ import annotations

V5E_BF16_PEAK = 197e12  # FLOP/s per chip (public v5e spec)


def forward_matmul_flops_per_token(
    cfg, seq_len: int, head_positions: int, head_width: int
) -> float:
    """Matmul FLOPs per processed token of one forward pass.

    head_positions/head_width: the logit head may be sliced to a position
    window (semi-AR block) and a vocab window (8k image codes) — serving
    samplers exploit both; training uses (seq_len, vocab).
    """
    d, f, L = cfg.d_model, cfg.mlp_hidden_size, cfg.n_layers
    per_layer = 2 * (4 * d * d + 3 * d * f)   # qkvo + gated mlp
    attn = 4 * seq_len * d                     # QK^T + PV, all heads
    head = 2 * d * head_width * (head_positions / seq_len)
    return L * (per_layer + attn) + head


def train_step_flops(cfg, batch: int, seq_len: int, remat="full"):
    """(useful_flops, hardware_flops) of one fwd+bwd training step.

    useful: the standard MFU numerator — forward + backward = 3x forward
    matmul FLOPs (backward does two matmuls per forward matmul).
    hardware: adds the rematerialization recompute, i.e. what the MXU
    actually executes. MFU uses `useful`; hardware/peak bounds the
    visible ceiling under remat. Recompute by mode (llada._wrap_remat):
      False/None — none.
      True/"full" — one extra forward of the checkpointed layer stack
        (the head/loss is outside the remat scope).
      "dots" — matmul outputs are saved; only the flash-attention forward
        re-runs in backward (the custom_vjp is opaque to the policy), so
        the recompute is the QK^T/PV einsums alone.
    """
    tokens = batch * seq_len
    fwd = tokens * forward_matmul_flops_per_token(
        cfg, seq_len, seq_len, cfg.vocab_size
    )
    layers_only = tokens * forward_matmul_flops_per_token(cfg, seq_len, 0, 0)
    attn_only = tokens * cfg.n_layers * 4 * seq_len * cfg.d_model
    useful = 3.0 * fwd
    recompute = {
        False: 0.0, None: 0.0,
        True: layers_only, "full": layers_only,
        "dots": attn_only,
    }[remat]
    return useful, useful + recompute
