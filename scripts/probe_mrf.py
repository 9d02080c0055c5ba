"""Fused-MRF kernel tuning probe: per-resblock time vs t_blk, against XLA.

Times one full AdainResBlock1 (6 rounds) at the stage-1 vocoder shapes
(B=16, C=128, T=48001) through the fused Pallas path at several block sizes,
and the unfused XLA composition, all with the chained-rep methodology
(the resblock chains internally; one scalar fetched at the end).

Usage: python scripts/probe_mrf.py [k=11] [blks=512,800,1536,2048,3072]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time(fn, *args, iters=5):
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.ravel()[0].astype("float32"))
    last = None
    for _round in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            sc = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype("float32")
            acc = sc if acc is None else acc + sc
        _ = float(acc)
        last = (time.perf_counter() - t0) / iters * 1000.0
    return last


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.models.decoder.resblock import (
        adain_resblock1_apply, adain_resblock1_fused, init_adain_resblock1)
    from styletts2_tpu.ops.pallas.mrf_round_kernel import (
        masked_stats_guarded, pack_guarded, unpack_guarded)
    from styletts2_tpu.utils import cast_pytree

    kw = dict(a.split("=") for a in sys.argv[1:] if "=" in a)
    k = int(kw.get("k", 11))
    blks = [int(v) for v in kw.get("blks", "512,800,1536,2048,3072").split(",")]
    c = int(kw.get("c", 128))
    t = int(kw.get("t", 48001))
    b = int(kw.get("b", 16))
    dil = (1, 3, 5)

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    p = cast_pytree(jax.jit(lambda key: init_adain_resblock1(
        key, c, k, dil, 128))(jax.random.PRNGKey(0)), dt)
    x = jnp.asarray(rng.standard_normal((b, c, t)), dt)
    s = jnp.asarray(rng.standard_normal((b, 128)), dt)
    lengths = jnp.full((b,), t, jnp.int32)

    results = {}

    def unfused(x, s):
        return adain_resblock1_apply(p, x, s, k, dil, lengths=lengths)

    results["xla"] = _time(jax.jit(unfused), x, s)

    modes = kw.get("modes", "taps,im2col").split(",")
    for t_blk in blks:
        for mode in modes:
            def fused(x, s, t_blk=t_blk, mode=mode):
                x_pad = pack_guarded(x, t_blk)
                stats = masked_stats_guarded(x_pad, lengths, t_blk, t)
                out_pad, _ = adain_resblock1_fused(p, x_pad, s, k, dil,
                                                   lengths, t, t_blk,
                                                   stats=stats,
                                                   conv_mode=mode)
                return unpack_guarded(out_pad, t_blk, t)

            try:
                results[f"fused_{mode}_blk{t_blk}"] = _time(jax.jit(fused), x, s)
            except Exception as e:  # VMEM OOM etc.
                results[f"fused_{mode}_blk{t_blk}"] = f"fail: {type(e).__name__}"

    print(json.dumps({"k": k, "c": c, "t": t, "b": b,
                      "ms": {kk: (round(v, 2) if isinstance(v, float) else v)
                             for kk, v in results.items()}}))


if __name__ == "__main__":
    main()
