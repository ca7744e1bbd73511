"""LM padding semantics: the EOS-flood failure mode and its two fixes.

The reference keeps EOS padding in the lm loss (prompting_utils.py:249-250)
— harmless for corpora that fill the frame, but fatal when rows are much
shorter than the concat frame: masked positions become ~95% EOS and the
model learns "masked → EOS" (proxy campaign B: loss_lm plateaued at 0.12
with 0% infill accuracy, SERVE_PROXY_r03.json empty text). Pins:

  * packing (`synthetic.text_batches(pack_chars=...)`) — the data-side,
    reference-faithful fix: rows are concatenated bank sentences;
  * `training.lm_pad_loss=false` — opt-in loss-side fix: pad labels leave
    the loss as IGNORE_ID while real text + terminal EOS stay in.
"""

import dataclasses

import jax
import numpy as np
import pytest

from mmada_tpu.core.config import Config
from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.data import synthetic
from mmada_tpu.models import llada
from mmada_tpu.models.mmada import MMadaModel
from mmada_tpu.prompting.universal import (
    ByteTokenizer, SpecialIds, UniversalPrompting,
)
from mmada_tpu.training import losses as L
from mmada_tpu.training.trainer import Trainer


def test_text_batches_packing():
    rows = next(synthetic.text_batches(4, n_sentences=8, pack_chars=400))
    for row in rows["input_ids"]:
        assert len(row) >= 400
        # every packed row is whole bank sentences joined by single spaces
        for part in row.split(" story"):
            assert "story" in ("story" + part) or part.startswith(" ")
    # unpacked rows are single bank sentences
    rows = next(synthetic.text_batches(4, n_sentences=8))
    assert all(r.startswith("story ") and len(r) < 80
               for r in rows["input_ids"])


def _tiny_trainer(tmp_path, lm_pad_loss):
    vocab = tiny_layout()
    arch = llada.tiny_config(vocab_size=vocab.total_vocab_size, n_layers=2)
    arch = dataclasses.replace(arch, mask_token_id=vocab.mask_token_id)
    model = MMadaModel(
        cfg=arch, params=llada.init_params(jax.random.key(0), arch),
        vocab=vocab,
    )
    tok = ByteTokenizer()
    prompting = UniversalPrompting(
        tok, SpecialIds.from_vocab(vocab), max_text_len=16
    )
    cfg = Config({
        "experiment": {"output_dir": str(tmp_path)},
        "training": {
            "batch_size_lm": 2, "max_train_steps": 1,
            "lm_pad_loss": lm_pad_loss,
        },
    })
    return Trainer(cfg, model, prompting), vocab


@pytest.mark.parametrize("lm_pad_loss", [True, False])
def test_prepare_batch_lm_pad_labels(tmp_path, lm_pad_loss):
    trainer, vocab = _tiny_trainer(tmp_path, lm_pad_loss)
    texts = ["ab", "abcdef"]
    batch = trainer.prepare_batch({"lm_flow": {"input_ids": texts}})
    labels = np.asarray(batch["lm_labels"])
    eos = trainer.prompting.sp.eos
    for row, text in zip(labels, texts):
        native = 1 + len(text) + 1        # bos + bytes + terminal eos
        # real text and the terminal EOS are always in-loss
        assert (row[:native] != L.IGNORE_ID).all()
        assert row[native - 1] == eos
        if lm_pad_loss:
            # reference-faithful: the EOS padding carries loss
            assert (row[native:] == eos).all()
        else:
            assert (row[native:] == L.IGNORE_ID).all()
