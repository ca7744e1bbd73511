"""Caption joins and the driver entry points as regression tests."""

import csv
import json
import os

import numpy as np
import pytest

from mmada_tpu.data import captions as C


def test_caption_dir_join(tmp_path):
    (tmp_path / "k1.txt").write_text("a nice photo\n")
    fn = C.caption_dir_join(str(tmp_path))
    assert fn({"__key__": "shard/k1"}) == "a nice photo"
    assert fn({"__key__": "missing"}) is None


def test_journeydb_join(tmp_path):
    path = tmp_path / "anno.json"
    path.write_text(json.dumps([
        {"img_path": "imgs/abc.jpg", "prompt": "castle at dusk"},
    ]))
    fn = C.journeydb_join(str(path))
    assert fn({"__key__": "abc"}) == "castle at dusk"
    assert fn({"__key__": "zzz"}) is None


def test_qa_csv_join_cot(tmp_path):
    path = tmp_path / "qa.csv"
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["image", "question", "answer", "cot"])
        w.writeheader()
        w.writerow({"image": "x.jpg", "question": "2+2?", "answer": "4",
                    "cot": "two plus two"})
    fn = C.qa_csv_join(str(path), reasoning_column="cot", use_cot=True)
    out = fn({"__key__": "x"})
    assert "Reasoning: two plus two" in out and "Answer: 4" in out
    plain = C.qa_csv_join(str(path))
    assert plain({"__key__": "x"}) == "Question: 2+2?\nAnswer: 4"


def test_add_caption_prompt_and_first_of():
    fn = C.add_caption_prompt(seed=0)
    out = fn({"caption": "a dog"})
    assert out.endswith("a dog") and len(out) > len("a dog")
    combo = C.first_of(lambda s: None, lambda s: "fallback")
    assert combo({}) == "fallback"


def test_graft_entry_compiles():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    jax.jit(fn).lower(*args).compile()


def test_graft_entry_dryrun_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
