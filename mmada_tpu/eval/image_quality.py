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


def load_scorer(clip_dir: Optional[str] = None) -> ImageQualityScorer:
    """Build a scorer from a local CLIP checkpoint dir (transformers
    CLIPModel format) when present."""
    if not clip_dir:
        return ImageQualityScorer()
    try:
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
    except Exception as e:
        logger.warning("CLIP scorer load failed (%s): %s", clip_dir, e)
        return ImageQualityScorer()
