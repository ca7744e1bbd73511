"""UniversalPrompting layout tests (reference: training/prompting_utils.py)."""

import numpy as np
import pytest

from mmada_tpu.core.vocab import tiny_layout
from mmada_tpu.prompting.universal import (
    IGNORE_ID,
    ByteTokenizer,
    SpecialIds,
    UniversalPrompting,
)


@pytest.fixture
def up():
    vocab = tiny_layout(text_vocab_size=300)
    sp = SpecialIds(
        soi=280, eoi=281, t2i=282, mmu=283, r2i=284, t2m=285, som=286,
        eom=287, pad=vocab.pad_token_id, bos=1, eos=2, end_header=290,
    )
    tok = ByteTokenizer()
    return UniversalPrompting(tok, sp, max_text_len=16, cond_dropout_prob=0.0)


def test_t2i_layout(up):
    img = np.arange(8).reshape(1, 8) + 100
    ids, mask, labels = up(( ["hi"], img, img ), "t2i")
    sp = up.sp
    # [pad]* t2i bos h i eos soi img eoi
    seq = ids[0]
    assert seq.shape[0] == up.max_text_len + 8 + 2
    text_part = seq[: up.max_text_len]
    assert text_part[-1] == sp.eos
    t2i_pos = np.nonzero(text_part == sp.t2i)[0][0]
    assert (text_part[:t2i_pos] == sp.pad).all()
    assert text_part[t2i_pos + 1] == sp.bos
    assert seq[up.max_text_len] == sp.soi
    np.testing.assert_array_equal(seq[up.max_text_len + 1:-1], img[0])
    assert seq[-1] == sp.eoi
    # mask: zeros over pads, ones elsewhere
    assert (mask[0][:t2i_pos] == 0).all() and (mask[0][t2i_pos:] == 1).all()
    # labels: pads ignored
    assert (labels[0][:t2i_pos] == IGNORE_ID).all()
    np.testing.assert_array_equal(labels[0][up.max_text_len + 1:-1], img[0])


def test_t2i_cond_dropout():
    vocab = tiny_layout(text_vocab_size=300)
    sp = SpecialIds(soi=280, eoi=281, t2i=282, mmu=283, r2i=284, t2m=285,
                    som=286, eom=287, pad=vocab.pad_token_id, bos=1, eos=2)
    up = UniversalPrompting(
        ByteTokenizer(), sp, max_text_len=16, cond_dropout_prob=1.0,
        rng=np.random.default_rng(0),
    )
    img = np.arange(8).reshape(1, 8) + 100
    ids, _, _ = up((["some long caption"], img, img), "t2i")
    text = ids[0][: up.max_text_len]
    nonpad = text[text != sp.pad]
    np.testing.assert_array_equal(nonpad, [sp.t2i, sp.bos, sp.eos])


def test_lm_layout(up):
    ids, mask, labels = up((["ab", "this is longer"], 8), "lm")
    assert ids.shape == (2, 8)
    # short row: bos a b eos then eos-padding; mask marks the real span
    assert ids[0][0] == up.sp.bos and ids[0][3] == up.sp.eos
    assert (ids[0][4:] == up.sp.eos).all()
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 0, 0, 0, 0])
    # long row truncated, full mask
    assert (mask[1] == 1).all()
    np.testing.assert_array_equal(ids, labels)


def test_lm_chat_prompt_mask(up):
    tok = up.text_tokenizer
    # craft ids containing end_header at a known position via raw call
    texts = ["q"]
    ids, pmask, _ = up((texts, 8), "lm_chat")
    assert (pmask == 0).all()  # no end_header token in byte text


def test_mmu_layout(up):
    img = np.arange(4).reshape(1, 4) + 100
    ids, pmask, labels = up((img, ["ok"]), "mmu")
    sp = up.sp
    seq = ids[0]
    assert seq[0] == sp.mmu and seq[1] == sp.soi
    np.testing.assert_array_equal(seq[2:6], img[0])
    assert seq[6] == sp.eoi
    assert seq[7] == sp.bos
    # frame positions ignored in labels
    assert (labels[0][:7] == IGNORE_ID).all()
    # prompt mask covers the image frame only (no end_header present)
    assert pmask[0][:7].all() and not pmask[0][7:].any()
    # text area padded with eos to max_text_len-1
    assert seq.shape[0] == 7 + up.max_text_len - 1


def test_t2m_layout(up):
    motion = np.arange(6).reshape(1, 6) + 200
    ids, mask, labels = up((["walk"], motion, motion), "t2m", dropout=False)
    sp = up.sp
    seq = ids[0]
    assert seq[up.max_text_len] == sp.som
    np.testing.assert_array_equal(seq[up.max_text_len + 1:-1], motion[0])
    assert seq[-1] == sp.eom
    assert labels[0][up.max_text_len] == IGNORE_ID
    np.testing.assert_array_equal(labels[0][up.max_text_len + 1:-1], motion[0])


def test_r2i_layout(up):
    img = np.arange(4).reshape(1, 4) + 100
    ids, pmask, labels = up((img, ["desc"]), "r2i")
    sp = up.sp
    seq = ids[0]
    assert seq[0] == sp.r2i
    text_len = up.max_text_len - 1
    assert seq[text_len + 1] == sp.soi
    assert seq[-1] == sp.eoi
    np.testing.assert_array_equal(seq, labels[0])
    assert pmask[0][0] == 1 and pmask[0][text_len + 1] == 1


def test_unknown_task(up):
    with pytest.raises(NotImplementedError):
        up((["x"],), "nope")


def test_lm_chat_with_end_header():
    """Prompt mask covers everything up to the LAST <|end_header_id|>
    (prompting_utils.py:271-314)."""
    vocab = tiny_layout(text_vocab_size=300)
    END_HEADER = 290

    class StubTokenizer:
        bos_token_id, eos_token_id = 1, 2

        def __call__(self, texts, **kw):
            # "Q" -> [5, END_HEADER, 6, 7] ; multi-turn has two headers
            table = {
                "single": [5, END_HEADER, 6, 7],
                "multi": [5, END_HEADER, 6, 2, 8, END_HEADER, 9],
            }
            return {"input_ids": [table[t] for t in texts]}

    sp = SpecialIds(soi=280, eoi=281, t2i=282, mmu=283, r2i=284, t2m=285,
                    som=286, eom=287, pad=vocab.pad_token_id, bos=1, eos=2,
                    end_header=END_HEADER)
    up = UniversalPrompting(StubTokenizer(), sp, max_text_len=16,
                            cond_dropout_prob=0.0)
    ids, pmask, labels = up((["single", "multi"], 12), "lm_chat")
    # row 0: bos 5 EH 6 7 eos ... -> mask through index of EH (pos 2)
    assert pmask[0][:3].all() and not pmask[0][3:].any()
    # row 1: bos 5 EH 6 eos 8 EH 9 eos -> LAST EH at pos 6 -> mask 0..6
    assert pmask[1][:7].all() and not pmask[1][7:].any()

    # mmu prompt-mask also honors end_header (prompting_utils.py:368-377)
    img = np.arange(4).reshape(1, 4) + 100
    mids, mpmask, mlabels = up((img, ["single"]), "mmu")
    frame_len = 4 + 3  # mmu soi img eoi
    assert mpmask[0][: frame_len + 3].all()
    assert not mpmask[0][frame_len + 3:].any()
