"""Checkpoint save/load/convert.

Native format: flattened-name ``.npz`` archives with a JSON meta sidecar —
a torch-free, accelerator-free serialization that supports resume
(params + optimizer states + counters) like the reference's
``{net, optimizer, iters, epoch}`` dicts (ref: train_first.py:547-571).

Reference ``.pth`` conversion: maps each of the 13 module state dicts into
our nested params with shape adaptation (ref: models.py:1113-1239), including
the diffusion wrapper's duplicated ``unet.* / diffusion.net.*`` keys.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .torch_compat import (
    convert_module_state,
    flatten,
    load_torch_file,
    nest,
    strip_prefix,
    to_numpy_state,
)

META_SUFFIX = ".meta.json"


def save_checkpoint(path: str, zoo: Mapping, opt_states: Optional[Mapping] = None,
                    epoch: int = 0, iters: int = 0, extra: Optional[Dict] = None):
    # np.savez appends ".npz" to other extensions silently; normalize up front
    # so the meta sidecar always sits next to the real archive name.
    if not path.endswith(".npz"):
        path = path + ".npz"
    flat = {f"net.{k}": np.asarray(v) for k, v in flatten(zoo).items()}
    if opt_states is not None:
        opt_flat, opt_tree = _flatten_pytree(opt_states)
        flat.update({f"opt.{i}": np.asarray(v) for i, v in enumerate(opt_flat)})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)
    meta = {"epoch": epoch, "iters": iters, "extra": extra or {}}
    if opt_states is not None:
        meta["opt_tree"] = True
    with open(path + META_SUFFIX, "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, zoo: Optional[Mapping] = None,
                    opt_template: Optional[Mapping] = None):
    """Returns (zoo_params, opt_states | None, epoch, iters, extra).

    ``extra`` is the free-form meta dict stored by :func:`save_checkpoint`
    (e.g. ``sigma_data`` for stage-2 resume, ref: train_second.py:1218-1224).
    """
    if not path.endswith(".npz") and os.path.exists(path + ".npz"):
        path = path + ".npz"
    data = np.load(path)
    net_flat = {k[len("net."):]: data[k] for k in data.files if k.startswith("net.")}
    params = nest(net_flat)
    meta = {"epoch": 0, "iters": 0, "extra": {}}
    if os.path.exists(path + META_SUFFIX):
        meta.update(json.load(open(path + META_SUFFIX)))
    opt_states = None
    if opt_template is not None:
        opt_leaves = [data[f"opt.{i}"] for i in range(len([k for k in data.files if k.startswith("opt.")]))]
        if opt_leaves:
            treedef = jax.tree_util.tree_structure(opt_template)
            opt_states = jax.tree_util.tree_unflatten(treedef, opt_leaves)
    return params, opt_states, meta["epoch"], meta["iters"], meta.get("extra", {})


def _flatten_pytree(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


# ---------------------------------------------------------------------------
# Reference .pth conversion
# ---------------------------------------------------------------------------

#: zoo module -> transform applied to its torch state dict before re-nesting
def _convert_diffusion(state: Mapping[str, Any]) -> Dict:
    """The torch diffusion wrapper stores the denoiser twice (``unet.*`` and
    ``diffusion.net.*``, ref: models.py:1080-1089); keep one copy."""
    out = {}
    for k, v in state.items():
        if k.startswith("unet."):
            out[k[len("unet."):]] = v
        elif k.startswith("diffusion.net."):
            out.setdefault(k[len("diffusion.net."):], v)
    return {"transformer": nest(to_numpy_state(out))}


def convert_reference_checkpoint(
    path: str,
    current_zoo: Optional[Mapping] = None,
    ignore_modules: Sequence[str] = (),
) -> Dict:
    """Convert a reference ``.pth`` training checkpoint ({net: {module:
    state_dict}}) into a zoo params dict (ref: models.py:1218-1239)."""
    state = load_torch_file(path)
    nets = state.get("net", state)
    zoo: Dict = {}
    for name, module_state in nets.items():
        if name in ignore_modules:
            continue
        module_state = strip_prefix(dict(module_state))
        if name == "diffusion":
            zoo[name] = _convert_diffusion(module_state)
        else:
            cur = current_zoo.get(name) if current_zoo else None
            zoo[name] = convert_module_state(module_state, cur, name)
    return zoo


def convert_plbert_checkpoint(ckpt_path: str) -> Dict:
    """PL-BERT ``step_*.t7`` -> bert params (ref: Utils/PLBERT/util.py:98-112)."""
    state = load_torch_file(ckpt_path)["net"]
    out = {}
    for k, v in state.items():
        k = k[7:] if k.startswith("module.") else k         # strip "module."
        if k.startswith("encoder."):
            k = k[8:]
            if k == "embeddings.position_ids":
                continue
            out[k] = v
    return nest(to_numpy_state(out))


def convert_hf_whisper_encoder(model_name_or_state) -> Dict:
    """HF WhisperModel state dict -> slm_encoder params.

    Accepts a state-dict mapping, a local ``.pt``/``.pth``/``.bin`` file
    holding one, or an HF model name/dir for ``from_pretrained``."""
    if isinstance(model_name_or_state, Mapping):
        state = model_name_or_state
    elif isinstance(model_name_or_state, str) and os.path.isfile(model_name_or_state):
        state = load_torch_file(model_name_or_state)
        if "state_dict" in state:
            state = state["state_dict"]
    else:
        from transformers import WhisperModel

        state = WhisperModel.from_pretrained(model_name_or_state).state_dict()
    enc = {k[len("encoder."):]: v for k, v in state.items() if k.startswith("encoder.")}
    if not enc:  # already encoder-only keys
        enc = dict(state)
    return nest(to_numpy_state(enc))


# ---------------------------------------------------------------------------
# Pretrained-encoder wiring for the training CLIs
# ---------------------------------------------------------------------------

def find_plbert_checkpoint(plbert_dir: str) -> Optional[str]:
    """Newest ``step_*.t7`` in a PL-BERT directory
    (ref: Utils/PLBERT/util.py:87-96 picks the max-iteration file)."""
    import re

    best, best_step = None, -1
    for name in os.listdir(plbert_dir):
        m = re.match(r"step_(\d+)\.(t7|pt|pth)$", name)
        if m and int(m.group(1)) > best_step:
            best_step = int(m.group(1))
            best = os.path.join(plbert_dir, name)
    return best


def _adapt(params: Mapping, cur: Optional[Mapping], name: str) -> Dict:
    """Shape-adapt converted nested params against the current module."""
    if cur is None:
        return dict(params)
    from .torch_compat import match_state_dict

    cur_flat = {k: np.asarray(v) for k, v in flatten(cur).items()}
    return nest(match_state_dict(cur_flat, flatten(params), name))


def _convert_single_module(path: str, cur: Optional[Mapping], name: str) -> Dict:
    """Convert a single-module torch checkpoint (ASR ``{'model': sd}``,
    JDC ``{'net': sd}``, or a bare state dict — ref: models.py:743-853)."""
    state = load_torch_file(path)
    for key in ("model", "net", "state_dict"):
        if isinstance(state, Mapping) and isinstance(state.get(key), Mapping):
            state = state[key]
            break
    if isinstance(state.get(name), Mapping):  # full training ckpt keyed by module
        state = state[name]
    return convert_module_state(dict(state), cur, name)


def load_pretrained_encoders(cfg, zoo: Dict, allow_random: Optional[bool] = None
                             ) -> Dict[str, str]:
    """Load the frozen/pretrained encoders the reference recipes require into
    ``zoo`` in place: ASR text aligner + JDC pitch extractor
    (ref: train_first.py:208-222, train_second.py:300-326), PL-BERT
    (ref: train_first.py:223-227, Utils/PLBERT/util.py:82-142), and the
    Whisper SLM encoder (ref: losses.py:204-214).

    A configured-but-missing source raises (training against randomly
    initialized frozen encoders is silently wrong); set
    ``STYLETTS2_ALLOW_RANDOM_ENCODERS=1`` (or ``allow_random=True``) to
    downgrade to a loud warning for smoke tests.  Returns {module: source}.
    """
    import logging

    logger = logging.getLogger(__name__)
    if allow_random is None:
        allow_random = os.environ.get("STYLETTS2_ALLOW_RANDOM_ENCODERS") == "1"
    loaded: Dict[str, str] = {}

    def missing(msg: str):
        if allow_random:
            logger.warning("pretrained encoder missing (random init kept): %s", msg)
        else:
            raise FileNotFoundError(
                msg + " — set STYLETTS2_ALLOW_RANDOM_ENCODERS=1 to run anyway "
                "with randomly initialized frozen encoders (NOT a valid "
                "training configuration)")

    for name, path, field in (("text_aligner", cfg.ASR_path, "ASR_path"),
                              ("pitch_extractor", cfg.F0_path, "F0_path")):
        if name not in zoo:
            continue
        if not path:
            missing(f"{name}: config field {field} is empty")
        elif not os.path.exists(path):
            missing(f"{name}: {field}={path!r} does not exist")
        else:
            zoo[name] = _convert_single_module(path, zoo.get(name), name)
            loaded[name] = path

    if "bert" in zoo:
        src = cfg.PLBERT_dir
        ckpt = None
        if src and os.path.isdir(src):
            ckpt = find_plbert_checkpoint(src)
        elif src and os.path.isfile(src):
            ckpt = src
        if not src:
            missing("bert: config field PLBERT_dir is empty")
        elif ckpt is None:
            missing(f"bert: no step_*.t7 checkpoint under PLBERT_dir={src!r}")
        else:
            zoo["bert"] = _adapt(convert_plbert_checkpoint(ckpt), zoo.get("bert"),
                                 "bert")
            loaded["bert"] = ckpt

    if "slm_encoder" in zoo:
        model = cfg.model_params.slm.model
        try:
            converted = convert_hf_whisper_encoder(model)
        except Exception as exc:  # offline / missing local weights
            missing(f"slm_encoder: cannot load {model!r} ({exc})")
        else:
            zoo["slm_encoder"] = _adapt(converted, zoo.get("slm_encoder"),
                                        "slm_encoder")
            loaded["slm_encoder"] = str(model)
    return loaded


def zoo_to_device(zoo: Mapping, dtype=None) -> Dict:
    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(a.dtype, jnp.floating):
            a = a.astype(dtype)
        return a

    return jax.tree_util.tree_map(conv, dict(zoo))
