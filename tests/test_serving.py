"""Data-parallel bucketed serving over the virtual CPU mesh."""

import numpy as np

import jax

from styletts2_tpu.infer import InferenceEngine
from styletts2_tpu.parallel.mesh import make_mesh
from styletts2_tpu.serve import BatchSynthesizer
from styletts2_tpu.testing import tiny_zoo
from styletts2_tpu.models.plbert import PLBertConfig


def test_batched_serving_on_mesh():
    zoo, cfgs = tiny_zoo(include_slm=False)
    plbert = PLBertConfig(vocab_size=179, embedding_size=8, hidden_size=24,
                          num_attention_heads=2, intermediate_size=32,
                          max_position_embeddings=64, num_hidden_layers=1)
    engine = InferenceEngine(zoo, cfgs["model"], plbert, frame_bucket=50)
    mesh = make_mesh(n_data=4)
    server = BatchSynthesizer(engine, mesh=mesh, max_batch=8,
                              length_buckets=(16, 32))
    texts = ["ola tu", "bonjur mes amis", "ola", "tutu lala bubu",
             "a b c", "helo wrld", "xyz"]
    waves = server.synthesize_many(texts, key=jax.random.PRNGKey(0),
                                   diffusion_steps=3)
    assert len(waves) == len(texts)
    for w in waves:
        assert w is not None and w.ndim == 1 and np.isfinite(w).all()
