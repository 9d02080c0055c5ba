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
