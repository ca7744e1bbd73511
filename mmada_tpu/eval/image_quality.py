"""Image quality instruments: CLIP score and reward-model hooks.

Equivalent of the reference's stage-4 `quantative_images` evaluation
(train_mmada_stage4.py:1008-1115: torchmetrics CLIP-score + ImageReward).
Both depend on pretrained scoring models; this module provides the scoring
math and a loader contract for locally-available checkpoints, degrading to
an explicit `available=False` in zero-egress environments rather than
crashing the eval loop.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def clip_score_from_embeddings(
    image_embs: np.ndarray,  # (B, D) L2-normalized
    text_embs: np.ndarray,   # (B, D) L2-normalized
    scale: float = 100.0,
) -> np.ndarray:
    """CLIP score: max(100·cos(img, text), 0) per pair (the torchmetrics
    definition used by the reference)."""
    def norm(x):
        return x / np.clip(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8, None)

    sims = (norm(image_embs) * norm(text_embs)).sum(-1)
    return np.maximum(scale * sims, 0.0)


@dataclasses.dataclass
class ImageQualityScorer:
    """Bundles embedding fns for CLIP-score and an optional reward model.

    image_embed_fn(pixels (B,H,W,C) in [-1,1]) -> (B, D)
    text_embed_fn(list[str]) -> (B, D)
    reward_fn(pixels, prompts) -> (B,) — ImageReward analog.
    """

    image_embed_fn: Optional[Callable] = None
    text_embed_fn: Optional[Callable] = None
    reward_fn: Optional[Callable] = None

    @property
    def available(self) -> bool:
        return self.image_embed_fn is not None and self.text_embed_fn is not None

    def clip_scores(self, pixels: np.ndarray, prompts: Sequence[str]) -> Optional[np.ndarray]:
        if not self.available:
            logger.warning("CLIP scorer unavailable (no local checkpoint)")
            return None
        img = np.asarray(self.image_embed_fn(pixels))
        txt = np.asarray(self.text_embed_fn(list(prompts)))
        return clip_score_from_embeddings(img, txt)

    def rewards(self, pixels: np.ndarray, prompts: Sequence[str]) -> Optional[np.ndarray]:
        if self.reward_fn is None:
            return None
        return np.asarray(self.reward_fn(pixels, list(prompts)))

    def quantitative_images(self, pixels, prompts) -> dict:
        """The stage-4 eval summary dict."""
        out: dict = {}
        cs = self.clip_scores(pixels, prompts)
        if cs is not None:
            out["clip_score_mean"] = float(cs.mean())
            out["clip_score"] = cs.tolist()
        rw = self.rewards(pixels, prompts)
        if rw is not None:
            out["image_reward_mean"] = float(rw.mean())
        return out


def load_scorer(clip_dir: Optional[str] = None,
                reward_dir: Optional[str] = None,
                backend: str = "jax") -> ImageQualityScorer:
    """Build a scorer from local checkpoint dirs when present.

    clip_dir: transformers CLIPModel layout. With backend="jax" (default)
    the towers run as the golden-tested JAX rebuild (eval/clip_jax.py) on
    the accelerator — only tokenization/pixel normalization stay on the
    host; backend="torch" keeps the old CPU path for cross-checks.
    reward_dir: an ImageReward checkpoint (`ImageReward.pt` state dict or
    a dir containing it) -> eval/image_reward_jax.py `rewards()`.
    """
    scorer = ImageQualityScorer()
    if clip_dir:
        try:
            scorer = (_jax_clip_scorer(clip_dir) if backend == "jax"
                      else _torch_clip_scorer(clip_dir))
        except Exception as e:
            logger.warning("CLIP scorer load failed (%s): %s", clip_dir, e)
    if reward_dir:
        try:
            scorer.reward_fn = _jax_reward_fn(reward_dir)
        except Exception as e:
            logger.warning("ImageReward load failed (%s): %s", reward_dir, e)
    return scorer


def _jax_clip_scorer(clip_dir: str) -> ImageQualityScorer:
    from transformers import CLIPProcessor

    from mmada_tpu.eval import clip_jax

    params, cfg = clip_jax.load_clip(clip_dir)
    processor = CLIPProcessor.from_pretrained(clip_dir)

    def image_embed(pixels):
        imgs = ((np.asarray(pixels) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        inputs = processor(images=list(imgs), return_tensors="np")
        return np.asarray(clip_jax.image_features(
            params, cfg, inputs["pixel_values"]))

    def text_embed(texts):
        inputs = processor(text=texts, return_tensors="np", padding=True,
                           truncation=True)
        return np.asarray(clip_jax.text_features(
            params, cfg, inputs["input_ids"],
            inputs.get("attention_mask")))

    return ImageQualityScorer(image_embed, text_embed)


def _torch_clip_scorer(clip_dir: str) -> ImageQualityScorer:
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(clip_dir)
    processor = CLIPProcessor.from_pretrained(clip_dir)
    model.eval()

    def image_embed(pixels):
        imgs = ((np.asarray(pixels) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        inputs = processor(images=list(imgs), return_tensors="pt")
        with torch.no_grad():
            return model.get_image_features(**inputs).numpy()

    def text_embed(texts):
        inputs = processor(text=texts, return_tensors="pt", padding=True,
                           truncation=True)
        with torch.no_grad():
            return model.get_text_features(**inputs).numpy()

    return ImageQualityScorer(image_embed, text_embed)


def _jax_reward_fn(reward_dir: str) -> Callable:
    """ImageReward scorer: BLIP ViT-L/BERT cross-modal backbone + MLP head
    (eval/image_reward_jax.py), tokenized with the BERT tokenizer the
    checkpoint ships with."""
    import os

    import torch
    from transformers import AutoTokenizer

    from mmada_tpu.eval import image_reward_jax as IR

    path = reward_dir
    if os.path.isdir(path):
        for cand in ("ImageReward.pt", "pytorch_model.bin"):
            if os.path.exists(os.path.join(path, cand)):
                path = os.path.join(path, cand)
                break
    state = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in state:
        state = state["state_dict"]
    # ImageReward-v1.0 geometry: BLIP w/ ViT-L 224/16 + BERT-base med
    cfg = IR.BlipRewardConfig(
        text_hidden=768, text_intermediate=3072, text_layers=12,
        text_heads=12, vision_hidden=1024, vision_intermediate=4096,
        vision_layers=24, vision_heads=16, image_size=224, patch_size=16,
    )
    params = IR.from_imagereward_state(state, cfg)
    tok = AutoTokenizer.from_pretrained(os.path.dirname(path) or ".")

    # BLIP inference normalization (ImageNet-ish constants from the repo)
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def reward(pixels, prompts):
        px = (np.asarray(pixels, np.float32) + 1.0) / 2.0  # [-1,1] -> [0,1]
        px = (px - mean) / std
        px = np.transpose(px, (0, 3, 1, 2))
        enc = tok(list(prompts), padding="max_length", truncation=True,
                  max_length=35, return_tensors="np")
        return np.asarray(IR.rewards(
            params, cfg, px, enc["input_ids"], enc["attention_mask"]))

    return reward
