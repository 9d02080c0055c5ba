"""NN primitives.

Import from the submodules directly (``styletts2_tpu.nn.conv``,
``.lstm``, ``.norm``, ``.linear``, ``.param_norm``, ``.activations``,
``.init``) — several function names intentionally mirror their submodule
names, so the package namespace re-exports only the unambiguous ones.
"""

from . import init  # noqa: F401
from .conv import conv1d, conv2d, conv_transpose1d, conv_transpose2d  # noqa: F401
from .norm import (  # noqa: F401
    layer_norm,
    layer_norm_channels,
    instance_norm,
    adain1d,
    ada_layer_norm,
)
from .param_norm import weight_norm_kernel, spectral_norm_kernel  # noqa: F401
from .activations import leaky_relu, snake  # noqa: F401
