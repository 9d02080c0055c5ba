"""MSD micro-ablation: where do the ~244 ms of the GAN discriminator step go?

Times, at bench_train.py shapes (batch 16, 192 mel frames -> 57600 samples):
  - the 3 STFT magnitude spectrograms alone (fwd, and fwd+bwd)
  - each resolution's conv tower alone (fwd+bwd through a scalar loss)
  - full msd_apply + discriminator loss (fwd+bwd) — the trained quantity

Methodology: scripts/ablate_train.py (chained scalar fetches, second timed
window).  Usage: python scripts/ablate_msd.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scalar(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    return leaf.ravel()[0].astype("float32")


def _time(fn, *args, iters=10):
    out = fn(*args)
    _ = float(_scalar(out))
    best = None
    for _round in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = _scalar(out)
            acc = s if acc is None else acc + s
        _ = float(acc)
        best = (time.perf_counter() - t0) / iters * 1000.0
    return best


def main():
    import jax
    import jax.numpy as jnp

    from styletts2_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from styletts2_tpu.audio.stft import hann_window, stft
    from styletts2_tpu.models import discriminators as D
    from styletts2_tpu.losses.gan import discriminator_loss_full
    from styletts2_tpu.utils import cast_pytree

    platform = jax.devices()[0].platform
    b = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    mel_len = int(os.environ.get("BENCH_TRAIN_MELLEN", "96"))
    t_audio = mel_len * 2 * 300

    msd = D.init_msd(jax.random.PRNGKey(0))
    if os.environ.get("BENCH_TRAIN_DTYPE", "bf16") == "bf16" and platform == "tpu":
        msd = cast_pytree(msd, jnp.bfloat16)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((b, 1, t_audio)).astype(np.float32)) * 0.1
    y_hat = jnp.asarray(rng.standard_normal((b, 1, t_audio)).astype(np.float32)) * 0.1

    results = {}

    # spectrograms alone
    def specs(y):
        outs = []
        for n_fft, hop, win in D.SPEC_RESOLUTIONS:
            outs.append(jnp.abs(stft(y[:, 0, :], n_fft, hop, win,
                                     hann_window(win))).sum())
        return sum(outs)

    results["stft_fwd"] = _time(jax.jit(specs), y)
    results["stft_bwd"] = _time(jax.jit(jax.grad(lambda yy: specs(yy))), y)

    # per-resolution tower fwd+bwd
    for i, res in enumerate(D.SPEC_RESOLUTIONS):
        p = msd["discriminators"][str(i)]

        def tower_loss(p, res=res):
            sr, fr = D._spec_discriminator(p, y, res)
            sg, fg = D._spec_discriminator(p, y_hat, res)
            loss = jnp.mean((sr - 1.0) ** 2) + jnp.mean(sg ** 2)
            return loss

        results[f"tower{i}_fwdbwd"] = _time(
            jax.jit(lambda pp, res=res: jax.value_and_grad(
                lambda q: tower_loss(q, res))(pp)[0]), p)

    # full MSD discriminator step
    def d_loss(params):
        rs, gs, frs, fgs = D.msd_apply(params, y, y_hat)
        return discriminator_loss_full(([], [], [], []), (rs, gs, frs, fgs))

    results["msd_fwd"] = _time(jax.jit(d_loss), msd)
    results["msd_fwdbwd"] = _time(
        jax.jit(lambda p: jax.value_and_grad(d_loss)(p)[0]), msd)

    print(json.dumps({"platform": platform, "batch": b, "t_audio": t_audio,
                      "impl": D._SPEC_CONV_IMPL,
                      "ms": {k: round(v, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
