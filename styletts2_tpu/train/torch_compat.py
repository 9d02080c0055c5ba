"""Torch checkpoint interop.

Because every model module in this package names parameters after the
reference torch ``state_dict`` keys, conversion is a pure re-nesting:
``"cnn.0.0.weight_v" -> params["cnn"]["0"]["0"]["weight_v"]``.

Loading ``.pth``/``.t7`` files uses torch (CPU) when available; tensors are
converted to numpy and never touch the accelerator until jitted code runs.

Also implements the reference's shape-adaptation rules for mismatched
checkpoints (ref: models.py:1113-1215): strip ``module.`` prefixes, keep
current weights for missing keys, copy+pad grown embedding/positional tables.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import numpy as np

try:  # torch is only needed when actually reading .pth files
    import torch
except Exception:  # pragma: no cover
    torch = None


def nest(flat: Mapping[str, Any]) -> Dict:
    """Dot-joined flat mapping -> nested dict."""
    out: Dict = {}
    for key, value in flat.items():
        node = out
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def flatten(params: Mapping, prefix: str = "") -> Dict[str, Any]:
    """Nested dict -> dot-joined flat mapping."""
    out: Dict[str, Any] = {}
    for key, value in params.items():
        full = f"{prefix}{key}"
        if isinstance(value, Mapping):
            out.update(flatten(value, full + "."))
        else:
            out[full] = value
    return out


def to_numpy_state(state: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in state.items():
        if torch is not None and isinstance(v, torch.Tensor):
            # .numpy() aliases the torch storage; copy so later in-place
            # mutation of the source module (e.g. spectral-norm power
            # iterations during a forward) cannot corrupt converted params.
            out[k] = v.detach().cpu().numpy().copy()
        else:
            out[k] = np.asarray(v)
    return out


def strip_prefix(state: Mapping[str, Any], prefix: str = "module.") -> Dict[str, Any]:
    return {k[len(prefix):] if k.startswith(prefix) else k: v for k, v in state.items()}


def match_state_dict(
    current_flat: Mapping[str, np.ndarray],
    loaded_flat: Mapping[str, np.ndarray],
    module_name: str = "",
    verbose: bool = True,
) -> Dict[str, np.ndarray]:
    """Align a checkpoint with the current parameter shapes
    (ref: models.py:1113-1215): missing keys keep current values; 2-D tables
    whose trailing dims match are copied row-wise and padded with the last
    checkpoint row; incompatible shapes keep current values."""
    loaded = strip_prefix(dict(loaded_flat))
    aligned: Dict[str, np.ndarray] = {}
    for name, cur in current_flat.items():
        if name not in loaded:
            if verbose:
                print(f"[{module_name}] missing key kept at current init: {name}")
            aligned[name] = np.asarray(cur)
            continue
        new = np.asarray(loaded[name])
        cur = np.asarray(cur)
        if new.shape == cur.shape:
            aligned[name] = new.astype(cur.dtype)
        elif new.shape[1:] == cur.shape[1:] and new.ndim == cur.ndim and cur.ndim >= 1:
            resized = cur.copy()
            n = min(cur.shape[0], new.shape[0])
            resized[:n] = new[:n].astype(cur.dtype)
            if cur.shape[0] > n and new.shape[0] > 0:
                resized[n:] = new[-1:].astype(cur.dtype)
            aligned[name] = resized
            if verbose:
                print(f"[{module_name}] resized {name}: {new.shape} -> {cur.shape}")
        else:
            if verbose:
                print(f"[{module_name}] incompatible {name}: ckpt {new.shape} vs {cur.shape}; kept current")
            aligned[name] = cur
    return aligned


def load_torch_file(path: str) -> Dict[str, Any]:
    if torch is None:
        raise RuntimeError("torch is required to read .pth checkpoints")
    return torch.load(path, map_location="cpu", weights_only=False)


def convert_module_state(
    state: Mapping[str, Any],
    current_params: Optional[Mapping] = None,
    module_name: str = "",
) -> Dict:
    """Torch flat state dict -> our nested numpy params, shape-adapted against
    ``current_params`` when provided."""
    flat = to_numpy_state(strip_prefix(dict(state)))
    if current_params is not None:
        cur_flat = {k: np.asarray(v) for k, v in flatten(current_params).items()}
        flat = match_state_dict(cur_flat, flat, module_name)
    return nest(flat)
