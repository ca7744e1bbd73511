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
