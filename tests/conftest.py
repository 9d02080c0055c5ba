"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set flags before the first ``import jax`` anywhere in the test session.
"""

import os

# Force-override: the surrounding environment may pin JAX_PLATFORMS to a real
# TPU platform; tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Keep matmuls in genuine float32 on CPU for golden-value comparisons.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# Belt and braces: jax may already have been imported by a pytest plugin
# before this conftest ran, in which case the env var alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
