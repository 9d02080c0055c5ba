"""Branch-batched MRF stage probe (round-5 HBM-traffic attack).

An MRF stage runs 3 resblock *branches* (k=3/7/11) over the SAME input, and
within each branch 3 *rounds* with dilations (1,3,5) — and the dilation of
round j is identical across branches.  So the whole stage can run branch-
batched: state (B, 3C, T), per round ONE elementwise norm/affine/snake pass
over 3C channels and ONE grouped conv (feature_group_count=3) whose per-
branch kernels are zero-padded from k_m to 11 (exact: 'same' conv of a
centered zero-padded kernel == 'same' conv of the original).

Variants measured with the chained-rep methodology (probe_chain.py):
  cur      current composition: 3 separate branch chains (resblock.py)
  grp      branch-batched, grouped convs with kernels padded to k=11
  splt     branch-batched elementwise, convs split per-branch (exact FLOPs)
  conv*    conv-only floors (what the stage costs with elementwise free)

Also reports trace+compile wall time per variant (the HLO-size story) and
max|err| of each variant vs `cur` on identical params.

Usage: python scripts/probe_mrf_batched.py [b] [c] [t]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROBE_REPS", "6"))
KSIZES = (3, 7, 11)
DILS = (1, 3, 5)
KMAX = 11


def _time(fn, *args, iters=5):
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(leaf.ravel()[0].astype("float32"))
    compile_s = time.perf_counter() - t0
    last = None
    for _round in range(2):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype("float32")
            acc = s if acc is None else acc + s
        _ = float(acc)
        last = (time.perf_counter() - t0) / iters * 1000.0
    return last / REPS, compile_s


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from styletts2_tpu.ops.fused import adain_snake

    dt = jnp.bfloat16
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 48000
    rng = np.random.default_rng(0)
    sdim = 128

    x = jnp.asarray(rng.standard_normal((b, c, t)) * 0.3, dt)
    s = jnp.asarray(rng.standard_normal((b, sdim)), dt)

    # per-branch params: convs1/convs2[m][i] (C,C,k_m), adain fc (2C, sdim)
    def mk_fc():
        return {"fc": {"weight": jnp.asarray(
            rng.standard_normal((2 * c, sdim)) * 0.05, jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(2 * c) * 0.05, jnp.float32)}}

    branches = []
    for m, k in enumerate(KSIZES):
        br = {"w1": [], "b1": [], "w2": [], "b2": [],
              "a1": [], "a2": [], "ad1": [], "ad2": []}
        for i in range(3):
            br["w1"].append(jnp.asarray(
                rng.standard_normal((c, c, k)) * (0.5 / (k * c) ** 0.5), jnp.float32))
            br["w2"].append(jnp.asarray(
                rng.standard_normal((c, c, k)) * (0.5 / (k * c) ** 0.5), jnp.float32))
            br["b1"].append(jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32))
            br["b2"].append(jnp.asarray(rng.standard_normal(c) * 0.02, jnp.float32))
            br["a1"].append(jnp.asarray(1.0 + rng.standard_normal((1, c, 1)) * 0.1, jnp.float32))
            br["a2"].append(jnp.asarray(1.0 + rng.standard_normal((1, c, 1)) * 0.1, jnp.float32))
            br["ad1"].append(mk_fc())
            br["ad2"].append(mk_fc())
        branches.append(br)

    def conv(h, w, bias, d):
        k = w.shape[-1]
        pad = (k * d - d) // 2
        y = lax.conv_general_dilated(
            h, w.astype(h.dtype), window_strides=(1,), padding=((pad, pad),),
            rhs_dilation=(d,), dimension_numbers=("NCH", "OIH", "NCH"))
        return y + bias.astype(h.dtype)[None, :, None]

    # ----- current composition ------------------------------------------
    def one_branch(x, br):
        for i in range(3):
            h = adain_snake(br["ad1"][i], x, s, br["a1"][i])
            h = conv(h, br["w1"][i], br["b1"][i], DILS[i])
            h = adain_snake(br["ad2"][i], h, s, br["a2"][i])
            h = conv(h, br["w2"][i], br["b2"][i], 1)
            x = x + h
        return x

    def cur(x):
        for _ in range(REPS):
            xs = None
            for br in branches:
                r = one_branch(x, br)
                xs = r if xs is None else xs + r
            x = (xs / 3).astype(dt)
        return x

    # ----- batched params ------------------------------------------------
    def pad_k(w):
        k = w.shape[-1]
        lo = (KMAX - k) // 2
        return jnp.pad(w, ((0, 0), (0, 0), (lo, KMAX - k - lo)))

    Wg1 = [jnp.concatenate([pad_k(br["w1"][i]) for br in branches], 0)
           for i in range(3)]                      # (3C, C, 11)
    Wg2 = [jnp.concatenate([pad_k(br["w2"][i]) for br in branches], 0)
           for i in range(3)]
    Bg1 = [jnp.concatenate([br["b1"][i] for br in branches]) for i in range(3)]
    Bg2 = [jnp.concatenate([br["b2"][i] for br in branches]) for i in range(3)]
    Ws1 = [[br["w1"][i] for br in branches] for i in range(3)]
    Ws2 = [[br["w2"][i] for br in branches] for i in range(3)]

    def cat_adain(key1, key2, i):
        # concatenated fc so gamma/beta split stays [all gammas | all betas]
        gs, bs, ws, vs = [], [], [], []
        for br in branches:
            w = br[key1][i]["fc"]["weight"]
            v = br[key1][i]["fc"]["bias"]
            gs.append(w[:c]); bs.append(w[c:])
            ws.append(v[:c]); vs.append(v[c:])
        wcat = jnp.concatenate(gs + bs, 0)
        vcat = jnp.concatenate(ws + vs, 0)
        acat = jnp.concatenate([br[key2][i].reshape(-1) for br in branches])
        return ({"fc": {"weight": wcat, "bias": vcat}}, acat.reshape(1, -1, 1))

    AD1 = [cat_adain("ad1", "a1", i) for i in range(3)]
    AD2 = [cat_adain("ad2", "a2", i) for i in range(3)]

    def gconv(h, w, bias, d):
        pad = (KMAX * d - d) // 2
        y = lax.conv_general_dilated(
            h, w.astype(h.dtype), window_strides=(1,), padding=((pad, pad),),
            rhs_dilation=(d,), feature_group_count=3,
            dimension_numbers=("NCH", "OIH", "NCH"))
        return y + bias.astype(h.dtype)[None, :, None]

    def grp(x):
        for _ in range(REPS):
            X = jnp.tile(x, (1, 3, 1))
            for i in range(3):
                h = adain_snake(AD1[i][0], X, s, AD1[i][1])
                h = gconv(h, Wg1[i], Bg1[i], DILS[i])
                h = adain_snake(AD2[i][0], h, s, AD2[i][1])
                h = gconv(h, Wg2[i], Bg2[i], 1)
                X = X + h
            x = X.reshape(b, 3, c, t).mean(1).astype(dt)
        return x

    def splt(x):
        for _ in range(REPS):
            X = jnp.tile(x, (1, 3, 1))
            for i in range(3):
                h = adain_snake(AD1[i][0], X, s, AD1[i][1])
                h = jnp.concatenate(
                    [conv(h[:, m * c:(m + 1) * c], Ws1[i][m],
                          Bg1[i][m * c:(m + 1) * c], DILS[i])
                     for m in range(3)], 1)
                h = adain_snake(AD2[i][0], h, s, AD2[i][1])
                h = jnp.concatenate(
                    [conv(h[:, m * c:(m + 1) * c], Ws2[i][m],
                          Bg2[i][m * c:(m + 1) * c], 1)
                     for m in range(3)], 1)
                X = X + h
            x = X.reshape(b, 3, c, t).mean(1).astype(dt)
        return x

    # conv-only floors
    def conv_floor_cur(x):
        for _ in range(REPS):
            h = x
            for i in range(3):
                for br in branches:
                    h = conv(h, br["w1"][i], br["b1"][i], DILS[i]) * 1e-3 + x
            x = h
        return x

    def conv_floor_grp(x):
        X = jnp.tile(x, (1, 3, 1))
        for _ in range(REPS):
            for i in range(3):
                X = gconv(X, Wg1[i], Bg1[i], DILS[i]) * 1e-3 + X
        return X

    results = {}
    for name, fn, arg in (("cur", cur, x), ("grp", grp, x), ("splt", splt, x),
                          ("conv_floor_cur", conv_floor_cur, x),
                          ("conv_floor_grp", conv_floor_grp, x)):
        ms, comp = _time(jax.jit(fn), arg)
        results[name] = (ms, comp)
        print(f"{name:16s} {ms:8.2f} ms/stage-rep   compile {comp:6.1f} s",
              flush=True)

    # exactness: one un-chained application of each variant vs cur
    global REPS
    saved, REPS = REPS, 1
    ref = np.asarray(jax.jit(cur)(x), np.float32)
    for name, fn in (("grp", grp), ("splt", splt)):
        got = np.asarray(jax.jit(fn)(x), np.float32)
        print(f"maxerr {name} vs cur: {np.abs(got - ref).max():.3e}")
    REPS = saved


if __name__ == "__main__":
    main()
