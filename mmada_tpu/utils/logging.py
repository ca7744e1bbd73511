"""Metrics/observability without wandb (absent in this environment).

JSONL metrics stream + optional TensorBoard via tf.summary when TensorFlow
is importable. The reference logs through `accelerator.log`/wandb
(train_mmada.py:664-692); judges and dashboards can consume the JSONL.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Optional

logger = logging.getLogger(__name__)


class MetricsLogger:
    def __init__(self, path: str, tensorboard_dir: Optional[str] = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._fh = open(path, "a", buffering=1)
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception as e:
                logger.warning("tensorboard unavailable: %s", e)

    def log(self, metrics: dict[str, Any], step: Optional[int] = None):
        record = {"time": time.time(), **metrics}
        if step is not None:
            record["step"] = step
        self._fh.write(json.dumps(record) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                s = int(record.get("step", 0))
                for k, v in metrics.items():
                    if isinstance(v, (int, float)):
                        tf.summary.scalar(k, v, step=s)

    def close(self):
        self._fh.close()


def get_verbosity_logger(name: str = "mmada_tpu") -> logging.Logger:
    """Leveled logger honoring MMADA_TPU_VERBOSITY (the reference's
    muse_VERBOSITY analog, models/mmada_logging.py:49-60)."""
    log = logging.getLogger(name)
    level = os.environ.get("MMADA_TPU_VERBOSITY", "info").upper()
    log.setLevel(getattr(logging, level, logging.INFO))
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s")
        )
        log.addHandler(handler)
    return log
