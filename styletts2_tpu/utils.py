"""Shared utilities: metrics logging, profiling, RTF math, precision policy.

Covers the reference's auxiliary subsystems (SURVEY.md §5): TensorBoard
scalar logging (optional, with a JSONL fallback that needs no extra deps),
wall-clock/RTF reporting as in the demo notebooks, the mixed-precision
auto-select (ref: utils.py:110-164 — on TPU 'auto' resolves to bf16), and a
``jax.profiler`` trace context for per-stage timing.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


class MetricsWriter:
    """Scalar logger: JSONL always; TensorBoard when available."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalars(self, step: int, scalars: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, **{f"{prefix}/{k}": float(v) for k, v in scalars.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (view with TensorBoard or xprof)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def rtf(elapsed_s: float, wave_samples: int, sr: int = 24000) -> float:
    """Real-time factor as printed by the demo notebooks
    (Demo/Inference_LJSpeech.ipynb cell 19): elapsed / audio_seconds."""
    return elapsed_s / (wave_samples / sr)


def select_mixed_precision(preference: str = "auto") -> str:
    """'auto' -> bf16 on TPU (all generations support it), else as requested
    (ref: utils.py:131-164 resolves auto per-GPU; TPUs are uniformly bf16)."""
    preference = (preference or "auto").strip().lower()
    if preference != "auto":
        if preference not in {"no", "bf16", "fp16"}:
            raise ValueError(f"unsupported mixed_precision '{preference}'")
        return preference
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "bf16" if platform == "tpu" else "no"


def cast_pytree(tree, dtype):
    def conv(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(conv, tree)
