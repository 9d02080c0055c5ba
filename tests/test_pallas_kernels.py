import numpy as np
import pytest

import jax
import jax.numpy as jnp

from styletts2_tpu.ops.monotonic import maximum_path
from styletts2_tpu.ops.pallas.monotonic_kernel import maximum_path_pallas


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_monotonic_matches_scan(seed):
    rng = np.random.default_rng(seed)
    b, t_text, t_mel = 3, 16, 24
    values = rng.standard_normal((b, t_text, t_mel)).astype(np.float32)
    tl = jnp.array([16, 9, 12])
    ml = jnp.array([24, 15, 12])
    want = np.asarray(maximum_path(jnp.asarray(values), tl, ml))
    got = np.asarray(maximum_path_pallas(jnp.asarray(values), tl, ml, interpret=True))
    np.testing.assert_array_equal(got, want)


class TestAdainSnakeKernel:
    """Fused AdaIN+Snake vs the XLA composition (the numerics oracle)."""

    def _inputs(self, b=2, c=16, t=96, masked=True):
        import numpy as np

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((b, c, t)).astype(np.float32))
        s = jnp.asarray(rng.standard_normal((b, 8)).astype(np.float32))
        params = {"fc": {
            "weight": jnp.asarray(rng.standard_normal((2 * c, 8)).astype(np.float32) * 0.2),
            "bias": jnp.asarray(rng.standard_normal((2 * c,)).astype(np.float32) * 0.1),
        }}
        alpha = jnp.asarray(1.0 + 0.3 * rng.standard_normal((1, c, 1)).astype(np.float32))
        lengths = jnp.asarray([t, t // 2], jnp.int32)[:b] if masked else None
        return params, x, s, alpha, lengths

    def _run_both(self, masked):
        from styletts2_tpu.ops import fused

        params, x, s, alpha, lengths = self._inputs(masked=masked)

        def f(impl):
            fused.set_adain_snake_impl(impl)
            try:
                def loss(x, params, alpha):
                    y = fused.adain_snake(params, x, s, alpha, lengths=lengths)
                    return (y * jnp.cos(jnp.arange(y.shape[-1]))).sum(), y
                (val, y), grads = jax.value_and_grad(
                    loss, argnums=(0, 1, 2), has_aux=True)(x, params, alpha)
                return y, grads
            finally:
                fused.set_adain_snake_impl("auto")
            return None

        y_ref, g_ref = f("xla")
        y_ker, g_ker = f("interpret")
        np.testing.assert_allclose(np.asarray(y_ker), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_ker),
                         jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)

    def test_unmasked_matches_xla(self):
        self._run_both(masked=False)

    def test_masked_matches_xla(self):
        self._run_both(masked=True)
