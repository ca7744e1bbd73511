"""Selective activation-checkpointing policy (llada._wrap_remat).

The round-3 MFU measurements put the full-remat recompute tax at ~20% of
hardware FLOPs (BASELINE.md round-3b); `remat="dots"` saves every matmul
output (jax.checkpoint dots_with_no_batch_dims_saveable) so the backward
recomputes only elementwise ops + the flash-attention forward. These
tests pin (a) config-string parsing (the `bool("dots")` bug class), and
(b) loss/grad equivalence across all remat modes — a checkpoint policy
must never change the math, only the recompute schedule.
"""

import jax
import jax.numpy as jnp
import optax
import pytest
from jax.flatten_util import ravel_pytree

from mmada_tpu.core.config import parse_remat
from mmada_tpu.core.precision import FP32
from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel


def test_parse_remat():
    assert parse_remat(False) is False
    assert parse_remat(None) is False
    assert parse_remat(True) == "full"
    assert parse_remat("true") == "full"
    assert parse_remat("full") == "full"
    assert parse_remat("dots") == "dots"
    assert parse_remat("DOTS") == "dots"
    assert parse_remat("auto") == "auto"
    assert parse_remat("off") is False
    assert parse_remat(1) == "full"
    with pytest.raises(ValueError):
        parse_remat("int8")


def _grads(remat):
    vl = tiny_layout()
    cfg = llada.tiny_config(vocab_size=vl.total_vocab_size, n_layers=3)
    params = llada.init_params(jax.random.key(0), cfg)
    ids = jax.random.randint(jax.random.key(1), (2, 24), 3, 200, jnp.int32)
    labels = jax.random.randint(jax.random.key(2), (2, 24), 3, 200, jnp.int32)

    @jax.jit
    def loss_and_grads(params):
        def loss_fn(p):
            m = MMadaModel(cfg=cfg, params=p, vocab=vl, policy=FP32,
                           remat=remat)
            logits = m.forward(ids)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        return jax.value_and_grad(loss_fn)(params)

    return loss_and_grads(params)


def test_remat_modes_grad_equivalent():
    base_loss, base_grads = _grads(False)
    for mode in ("full", "dots"):
        loss, grads = _grads(mode)
        assert jnp.allclose(loss, base_loss, rtol=1e-6), mode
        flat_b, _ = ravel_pytree(base_grads)
        flat_m, _ = ravel_pytree(grads)
        assert jnp.allclose(flat_m, flat_b, rtol=1e-5, atol=1e-6), mode


def test_invalid_remat_mode_raises():
    with pytest.raises(ValueError, match="remat"):
        _grads("everything")


def test_flops_accounting_orders():
    """full-remat recompute > dots recompute > none, and dots recompute is
    exactly the attention einsums."""
    from mmada_tpu.utils.flops import train_step_flops

    cfg = llada.llada_8b()
    useful, hw_none = train_step_flops(cfg, 4, 512, remat=False)
    _, hw_dots = train_step_flops(cfg, 4, 512, remat="dots")
    _, hw_full = train_step_flops(cfg, 4, 512, remat="full")
    assert useful == hw_none < hw_dots < hw_full
    attn = 4 * 512 * cfg.n_layers * 4 * 512 * cfg.d_model
    assert hw_dots - hw_none == attn


# ---------------------------------------------------------------- auto mode

def _tiny_trainer(tmp_path, budget_gb, monkeypatch):
    from mmada_tpu.core.config import Config
    from mmada_tpu.core.vocab import tiny_layout
    from mmada_tpu.prompting.universal import (
        ByteTokenizer, SpecialIds, UniversalPrompting,
    )
    from mmada_tpu.training.trainer import Trainer

    monkeypatch.setenv("MMADA_REMAT_AUTO_BUDGET_GB", str(budget_gb))
    vl = tiny_layout(text_vocab_size=256, image_codebook_size=32)
    cfg = llada.tiny_config(
        vocab_size=vl.total_vocab_size, d_model=32, n_heads=2, n_layers=2,
        mlp_hidden_size=64,
    )
    import dataclasses as dc
    cfg = dc.replace(cfg, mask_token_id=vl.mask_token_id)
    model = MMadaModel(
        cfg=cfg, params=llada.init_params(jax.random.key(0), cfg),
        vocab=vl, remat="auto",
    )
    sp = SpecialIds(soi=230, eoi=231, t2i=232, mmu=233, r2i=234, t2m=235,
                    som=236, eom=237, pad=vl.pad_token_id, bos=1, eos=2)
    prompting = UniversalPrompting(ByteTokenizer(), sp, max_text_len=8,
                                   cond_dropout_prob=0.0)
    ycfg = Config({
        "training": {"batch_size_lm": 2, "max_train_steps": 4},
        "experiment": {"output_dir": str(tmp_path / "out")},
    })
    return Trainer(ycfg, model, prompting)


def _lm_batch():
    import numpy as np
    ids = np.random.default_rng(0).integers(3, 250, size=(2, 16))
    return {"lm_input_ids": jnp.asarray(ids), "lm_labels": jnp.asarray(ids)}


@pytest.mark.parametrize("budget_gb,expect", [(1000, "dots"), (0.0001, "full")])
def test_auto_remat_resolution(tmp_path, monkeypatch, budget_gb, expect):
    """auto resolves to dots when the compiled step fits the budget and
    to full when it cannot; the first step runs either way and the
    resolved jitted fn replaces the trampoline."""
    tr = _tiny_trainer(tmp_path, budget_gb, monkeypatch)
    state0_step = int(tr.state.step)
    tr.state, metrics = tr.train_step(tr.state, _lm_batch(), jax.random.key(1))
    assert tr.remat_resolved[0] == expect, tr.remat_resolved
    assert jnp.isfinite(metrics["loss"])
    assert int(tr.state.step) == state0_step + 1
    # trampoline swapped out: second step goes straight to the jitted fn
    assert tr.train_step is not tr._resolve_auto_remat
    tr.state, metrics = tr.train_step(tr.state, _lm_batch(), jax.random.key(2))
    assert jnp.isfinite(metrics["loss"])
