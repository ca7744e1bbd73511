"""Data pipeline tests: parquet text stream, tar webdataset, imagenet
folder, combined loader, transforms."""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from mmada_tpu.data.combined import CombinedLoader
from mmada_tpu.data.imagenet import ImageNetDataset, collate_imagenet
from mmada_tpu.data.text import RefinedWebDataset, batched
from mmada_tpu.data.transforms import image_transform, image_transform_squash
from mmada_tpu.data.webdataset import (
    WebDatasetReader,
    brace_expand,
    collate_image_text,
)


@pytest.fixture
def parquet_dir(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    for i in range(3):
        texts = [f"file{i} doc{j} " + "x" * (j * 10) for j in range(20)]
        pq.write_table(pa.table({"content": texts}), tmp_path / f"part{i}.parquet")
    return str(tmp_path)


def test_refinedweb_stream(parquet_dir):
    ds = RefinedWebDataset(
        os.path.join(parquet_dir, "*.parquet"),
        max_length=50, shuffle_buffer=8, seed=0,
    )
    samples = [s for _, s in zip(range(30), iter(ds))]
    assert len(samples) == 30
    assert all(len(s["input_ids"]) <= 50 for s in samples)
    # rank sharding partitions files
    ds0 = RefinedWebDataset(os.path.join(parquet_dir, "*.parquet"),
                            rank=0, world_size=3, repeat=False, shuffle_buffer=1)
    docs0 = [s["input_ids"] for s in ds0]
    assert len(docs0) == 20


def test_batched(parquet_dir):
    ds = RefinedWebDataset(os.path.join(parquet_dir, "*.parquet"), shuffle_buffer=1)
    batches = [b for _, b in zip(range(4), batched(iter(ds), 5))]
    assert all(len(b) == 5 for b in batches)


def test_brace_expand():
    assert brace_expand("s-{000..002}.tar") == ["s-000.tar", "s-001.tar", "s-002.tar"]
    assert brace_expand("plain.tar") == ["plain.tar"]


@pytest.fixture
def tar_shards(tmp_path):
    for s in range(2):
        path = tmp_path / f"shard-{s:03d}.tar"
        with tarfile.open(path, "w") as tar:
            for i in range(6):
                key = f"sample{s}_{i:04d}"
                img = Image.fromarray(
                    (np.random.default_rng(i).random((32, 32, 3)) * 255).astype(np.uint8)
                )
                buf = io.BytesIO()
                img.save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{key}.jpg")
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
                cap = f"caption {s}-{i}".encode()
                info = tarfile.TarInfo(f"{key}.txt")
                info.size = len(cap)
                tar.addfile(info, io.BytesIO(cap))
    return str(tmp_path / "shard-{000..001}.tar")


def test_webdataset_reader(tar_shards):
    reader = WebDatasetReader(
        tar_shards, shuffle_buffer=1, resample=False,
        transform=lambda img: image_transform(img, 16),
    )
    samples = list(reader)
    assert len(samples) == 12
    assert samples[0]["pixels"].shape == (16, 16, 3)
    assert samples[0]["caption"].startswith("caption")
    batch = collate_image_text(samples[:4])
    assert batch["images"].shape == (4, 16, 16, 3)
    assert len(batch["input_ids"]) == 4


def test_webdataset_caption_join_and_filter(tar_shards):
    def caption_fn(sample):
        if sample["__key__"].endswith("0000"):
            return None  # drop
        return "external:" + sample["__key__"]

    reader = WebDatasetReader(
        tar_shards, shuffle_buffer=1, resample=False, caption_fn=caption_fn,
        transform=lambda img: image_transform_squash(img, 8),
    )
    samples = list(reader)
    assert len(samples) == 10
    assert all(s["caption"].startswith("external:") for s in samples)


@pytest.fixture
def imagenet_dir(tmp_path):
    for cls in ("n01440764", "n01443537"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            img = Image.fromarray(
                (np.random.default_rng(i).random((40, 48, 3)) * 255).astype(np.uint8)
            )
            img.save(d / f"img{i}.jpg")
    (tmp_path / "mapping.txt").write_text(
        "n01440764 tench\nn01443537 goldfish\n"
    )
    return tmp_path


def test_imagenet_dataset(imagenet_dir):
    ds = ImageNetDataset(
        str(imagenet_dir), str(imagenet_dir / "mapping.txt"), resolution=16
    )
    assert len(ds) == 6
    s = ds[0]
    assert s["pixels"].shape == (16, 16, 3)
    assert s["caption"] in ("tench", "goldfish")
    assert s["pixels"].min() >= -1.0 and s["pixels"].max() <= 1.0
    batch = collate_imagenet([ds[i] for i in range(4)])
    assert batch["images"].shape == (4, 16, 16, 3)


def test_imagenet_retries_bad_file(imagenet_dir):
    bad = imagenet_dir / "n01440764" / "img1.jpg"
    bad.write_bytes(b"not an image")
    ds = ImageNetDataset(str(imagenet_dir), resolution=8, shuffle=False)
    # every index returns a valid sample despite the corrupt file
    for i in range(len(ds)):
        assert ds[i]["pixels"].shape == (8, 8, 3)


def test_combined_loader_max_size_cycle():
    combined = CombinedLoader(
        {"a": [1, 2, 3, 4, 5, 6], "b": ["x", "y"]}, mode="max_size_cycle"
    )
    steps = list(combined)
    assert len(steps) == 6
    assert [s["a"] for s in steps] == [1, 2, 3, 4, 5, 6]
    assert [s["b"] for s in steps] == ["x", "y", "x", "y", "x", "y"]


def test_combined_loader_min_size():
    steps = list(CombinedLoader({"a": [1, 2, 3], "b": ["x", "y"]}, mode="min_size"))
    assert len(steps) == 2


def test_stage4_mmu_mixing_via_train_loader(tmp_path, tar_shards):
    """train.py builds a MixedStream when *_in_mmu_coeff sources exist."""
    import train as train_mod
    from mmada_tpu.core.config import load_config

    # second source: reuse the same shards under a different name
    cfg = load_config("configs/tiny_test.yaml", overrides=[
        f"dataset.params.train_cot_mmu_shards_path_or_url={tar_shards}",
        f"dataset.params.train_vqa_mmu_shards_path_or_url={tar_shards}",
        "dataset.params.cot_in_mmu_coeff=0.5",
        "dataset.params.vqa_in_mmu_coeff=0.5",
        "dataset.preprocessing.resolution=8",
        "training.batch_size_t2i=0", "training.batch_size_lm=0",
        "training.batch_size_mmu=2",
    ])
    loader = train_mod.build_dataloader(cfg)
    batch = next(iter(loader))
    assert batch["mmu_flow"]["images"].shape == (2, 8, 8, 3)
    assert len(batch["mmu_flow"]["input_ids"]) == 2
