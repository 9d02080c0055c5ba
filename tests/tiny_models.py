"""Compatibility shim: tiny configs now live in styletts2_tpu.testing."""

from styletts2_tpu.testing import (  # noqa: F401
    tiny_config,
    tiny_model_params,
    tiny_whisper_cfg,
    tiny_zoo,
)
