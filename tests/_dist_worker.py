"""Subprocess worker for the multi-process distribution tests.

Runs one tiny stage-2 training step on an 8-device CPU mesh that is either
owned by a single process (baseline) or split across N processes joined via
``jax.distributed`` + gloo CPU collectives (the TPU-pod topology in
miniature: each process holds 8/N local devices, the batch is assembled from
per-process shards, gradients all-reduce across process boundaries).

Usage: python _dist_worker.py <num_processes> <process_id> <port> [mode]
Prints ``METRICS {json}`` on process 0.

``mode``:
- ``full`` (default): one tiny stage-2 training step — the complete SPMD
  program (opt-in via STYLETTS2_DIST_TESTS=1; minutes of XLA-CPU compile).
- ``light``: a seconds-to-compile gradient step on a small MLP over the same
  joint mesh — exercises jax.distributed bring-up, gloo collectives,
  per-process shard assembly into a global batch, the cross-process gradient
  all-reduce, and host_global_min.  Runs in the default suite.

Parity target: identical losses to the single-process run
(ref: train_second.py:347-359 DDP semantics — every rank computes the same
global step).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

nproc = int(sys.argv[1])
pid = int(sys.argv[2])
port = sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "full"

os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // nproc}"

import jax  # noqa: E402

# persistent compile cache: the two same-topology workers share one compile
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DIST_TEST_CACHE", "/tmp/styletts2_dist_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
if nproc > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from styletts2_tpu.ops.monotonic import set_maximum_path_impl  # noqa: E402

set_maximum_path_impl("scan")  # CPU mesh: Pallas kernel only lowers for TPU

from styletts2_tpu.parallel.distributed import host_global_min  # noqa: E402
from styletts2_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, replicate_params, shard_batch)

assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == nproc, jax.process_count()

# cross-host static-bucket consensus (each host proposes a different value)
assert host_global_min(100 + pid) == 100

if mode == "light":
    # seconds-to-compile SPMD gradient step: same mesh/shard/all-reduce
    # machinery as the full step, none of its compile weight
    b, din, dh = 8, 16, 32
    rng = np.random.default_rng(0)
    params = {"w1": rng.standard_normal((din, dh)).astype(np.float32) * 0.1,
              "w2": rng.standard_normal((dh, 1)).astype(np.float32) * 0.1}
    x = rng.standard_normal((b, din)).astype(np.float32)
    y = rng.standard_normal((b, 1)).astype(np.float32)
    lb = b // nproc
    sl = slice(pid * lb, (pid + 1) * lb)
    local = {"x": x[sl], "y": y[sl]}

    def loss_fn(p, batch):
        h = jnp.tanh(batch["x"] @ p["w1"])
        return jnp.mean((h @ p["w2"] - batch["y"]) ** 2)

    mesh = make_mesh()
    with mesh:
        params_r = replicate_params(params, mesh)
        batch_r = shard_batch(local, mesh)
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params_r, batch_r)
        metrics = {"loss": float(loss),
                   "g1": float(jnp.abs(grads["w1"]).sum()),
                   "g2": float(jnp.abs(grads["w2"]).sum())}
    if pid == 0:
        print("METRICS " + json.dumps(metrics), flush=True)
    sys.exit(0)

from styletts2_tpu.testing import tiny_config, tiny_zoo  # noqa: E402
from styletts2_tpu.train.optimizers import MultiOptimizer  # noqa: E402
from styletts2_tpu.train.stage2 import Stage2Trainer  # noqa: E402

zoo, cfgs = tiny_zoo()
cfg = tiny_config()
opt = MultiOptimizer(zoo, {"bert": 1e-5}, default_lr=1e-4)
states = opt.init(zoo)
trainer = Stage2Trainer(cfg, cfgs, opt)
step = trainer.make_step(diff=True, joint=True, start_ds=True,
                         mel_len=40, mel_len_st=40, num_diff_steps=3,
                         slm_run_disc=False, slm_frame_capacity=32)

# deterministic GLOBAL batch; every process materializes all of it on the
# host and keeps only its row shard (what build_dataloader's shard slicing
# does on real data)
b, t_text, frames = 8, 12, 96
rng = np.random.default_rng(0)
batch = {
    "waves": (rng.standard_normal((b, frames * 300)) * 0.1).astype(np.float32),
    "texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
    "input_lengths": np.full((b,), t_text, np.int32),
    "ref_texts": rng.integers(4, 170, (b, t_text)).astype(np.int32),
    "ref_lengths": np.full((b,), t_text, np.int32),
    "mel_input_length": np.full((b,), frames, np.int32),
    "ref_waves": (rng.standard_normal((b, 32 * 300)) * 0.1).astype(np.float32),
    "ref_frame_lengths": np.full((b,), 32, np.int32),
}
lb = b // nproc
local = {k: v[pid * lb: (pid + 1) * lb] for k, v in batch.items()}

mesh = make_mesh()
with mesh:
    zoo_r = replicate_params(zoo, mesh)
    states_r = replicate_params(states, mesh)
    batch_r = shard_batch(local, mesh)
    out = step(zoo_r, states_r, batch_r, jax.random.PRNGKey(0), jnp.float32(0.2))
    metrics = {k: float(v) for k, v in out.metrics.items()}

if pid == 0:
    print("METRICS " + json.dumps(metrics), flush=True)
