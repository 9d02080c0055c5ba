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


def materialize_params(shapes, seed: int = 0):
    """Materialize an ``eval_shape`` param tree with numpy (no XLA compile).

    For compile checks and benchmarks the params only need correct
    shapes/dtypes and finite, well-scaled values — building the real zoo
    under jit costs minutes of XLA compile (2m20s for the full LJSpeech zoo
    on this host).  Small normals; positive batch-norm running_var; norm
    scales around 1.  Timing is value-independent (static shapes), so
    benchmarks over these params measure exactly what real params would.
    """
    import numpy as np

    rng = np.random.default_rng(seed)

    def materialize(path, s):
        name = jax.tree_util.keystr(path)
        if not jnp.issubdtype(s.dtype, jnp.floating):
            return jnp.zeros(s.shape, s.dtype)
        a = rng.standard_normal(s.shape).astype(np.float32)
        if a.ndim >= 2:
            # fan-in scaling keeps activations O(1) through deep residual
            # chains — flat 0.05 normals overflowed the iSTFTNet head's
            # exp() into inf/nan by the 12th resblock (f32, both DFT paths)
            fan_in = int(np.prod(s.shape[1:]))
            a *= 0.5 / np.sqrt(max(fan_in, 1))
        else:
            a *= 0.05
        if "running_var" in name:        # batch-norm stats: must be > 0
            a = np.abs(a) + 1.0
        elif name.endswith("weight']") and a.ndim == 1:
            a = a + 1.0                  # norm scales around 1
        return jnp.asarray(a, s.dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)


def enable_compilation_cache(path: str = "/tmp/styletts2_jax_cache") -> None:
    """Persist compiled XLA executables across processes.

    The full stage-2 step compiles for ~12 minutes on a v5e; with the cache
    a restarted run (or a bench rerun at identical shapes) loads the
    executable in seconds.  Honors an externally-set
    ``JAX_COMPILATION_CACHE_DIR``; call before the first compilation.

    Measured hazard: through the *axon* tunnel plugin a cache-deserialized
    executable runs ~200x slower than a freshly compiled one (11.3 s vs
    60 ms for the full stage-2 step, identical inputs), so the cache is
    skipped on that backend.  Local CPU/TPU backends are unaffected.
    """
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", path)
    try:
        version = jax.devices()[0].client.platform_version
        if "axon" in version.lower():
            logger.info("compilation cache skipped on the axon tunnel backend")
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # cache is an optimization, never fatal
        logger.warning("compilation cache disabled: %s", e)


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
