"""Batched, bucketed, data-parallel serving.

Covers BASELINE config 4: large utterance batches, bucketed-by-length
padding, data-parallel across a mesh.  The reference has no serving layer
(inference is batch-1 notebook functions); this is the production path the
framework is designed around:

- requests are grouped into token-length buckets (padding waste bounded)
- each bucket runs through the InferenceEngine's jitted stages
- with a mesh, the batch axis is sharded over ``data`` and params are
  replicated; on one chip it is plain batching
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from .infer import InferenceEngine
from .parallel.mesh import data_sharding, make_mesh, replicate_params


@dataclasses.dataclass
class ServeResult:
    index: int
    wave: np.ndarray


class BatchSynthesizer:
    """Bucket-and-batch front door over an InferenceEngine."""

    def __init__(self, engine: InferenceEngine, mesh=None,
                 max_batch: int = 64, length_buckets: Sequence[int] = (32, 64, 96, 128, 192, 256)):
        self.engine = engine
        self.mesh = mesh
        self.max_batch = max_batch
        self.length_buckets = sorted(length_buckets)
        if mesh is not None:
            self.engine.zoo = replicate_params(self.engine.zoo, mesh)
            self.engine.input_sharding = data_sharding(mesh)

    def _bucket_of(self, n: int) -> int:
        for b in self.length_buckets:
            if n <= b:
                return b
        return self.length_buckets[-1]

    def synthesize_many(
        self,
        phonemes: Sequence[str],
        key: Optional[jax.Array] = None,
        diffusion_steps: int = 5,
        **kw,
    ) -> List[np.ndarray]:
        """Synthesize an arbitrary number of utterances; returns waveforms in
        input order."""
        if key is None:
            key = jax.random.PRNGKey(0)
        token_lens = [len(self.engine.tokens_from_phonemes(p)) for p in phonemes]
        order: Dict[int, List[int]] = {}
        for i, n in enumerate(token_lens):
            order.setdefault(self._bucket_of(n), []).append(i)

        results: List[Optional[np.ndarray]] = [None] * len(phonemes)
        ctx = self.mesh if self.mesh is not None else _null_ctx()
        with ctx:
            for bucket, idxs in sorted(order.items()):
                for start in range(0, len(idxs), self.max_batch):
                    chunk = idxs[start: start + self.max_batch]
                    # pad the chunk to a full device multiple for sharding
                    pad_to = len(chunk)
                    if self.mesh is not None:
                        n_dev = self.mesh.devices.size
                        pad_to = ((len(chunk) + n_dev - 1) // n_dev) * n_dev
                    texts = [phonemes[i] for i in chunk]
                    texts += [texts[-1]] * (pad_to - len(chunk))
                    waves = self.engine.synthesize(
                        texts, key=jax.random.fold_in(key, bucket * 7919 + start),
                        diffusion_steps=diffusion_steps, **kw)
                    for i, w in zip(chunk, waves):
                        results[i] = w
        return results  # type: ignore


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
