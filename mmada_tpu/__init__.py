"""MMaDA-TPU: a TPU-native (JAX/XLA/Pallas/pjit) unified multimodal
masked-diffusion framework.

Re-designed from scratch with the capabilities of the MMaDA reference
(Gen-Verse/MMaDA, arXiv 2505.15809): one bidirectional LLaDA-style
transformer over a fused discrete vocabulary (text + image VQ + motion VQ),
with semi-autoregressive text denoising, MaskGIT-style image/motion
denoising, a MAGVIT-v2 LFQ image tokenizer, a 1-D conv motion VQ-VAE, a
multi-task trainer, and a batched mixed-modal serving engine.

Everything on the compute path is functional JAX: parameters are pytrees,
models are pure `apply` functions, samplers are `lax.scan` loops compiled
end-to-end with zero host round-trips per denoise step, and distribution is
GSPMD sharding over a `jax.sharding.Mesh` (data/fsdp/tensor axes).
"""

__version__ = "0.1.0"

from mmada_tpu.core.vocab import VocabLayout  # noqa: F401
from mmada_tpu.core.config import Config, load_config  # noqa: F401
