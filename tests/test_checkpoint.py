"""Checkpoint roundtrip + reference-format conversion tests."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from styletts2_tpu.train import checkpoint as ckpt
from styletts2_tpu.train.torch_compat import flatten, nest, to_numpy_state
from styletts2_tpu.testing import tiny_zoo


def test_npz_roundtrip(tmp_path):
    zoo, _ = tiny_zoo(include_slm=False)
    path = str(tmp_path / "test.npz")
    ckpt.save_checkpoint(path, zoo, epoch=3, iters=77, extra={"sigma_data": 0.23})
    params, _, epoch, iters, extra = ckpt.load_checkpoint(path, zoo)
    assert epoch == 3 and iters == 77
    assert extra == {"sigma_data": 0.23}
    for (ka, va), (kb, vb) in zip(sorted(flatten(zoo).items()),
                                  sorted(flatten(params).items())):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), vb)


def test_reference_pth_conversion(tmp_path):
    """Convert a synthetic reference-format .pth (torch tensors, module.
    prefixes, the duplicated diffusion unet keys) into zoo params."""
    zoo, _ = tiny_zoo(include_slm=False)
    # fabricate a torch-style checkpoint from our own params
    nets = {}
    for name in ("text_encoder", "bert_encoder"):
        flat = flatten(zoo[name])
        nets[name] = {("module." + k): torch.tensor(np.asarray(v)) for k, v in flat.items()}
    diff_flat = flatten(zoo["diffusion"]["transformer"])
    nets["diffusion"] = {}
    for k, v in diff_flat.items():
        t = torch.tensor(np.asarray(v))
        nets["diffusion"]["unet." + k] = t
        nets["diffusion"]["diffusion.net." + k] = t
    state = {"net": nets, "epoch": 5, "iters": 100}
    path = str(tmp_path / "ref.pth")
    torch.save(state, path)

    out = ckpt.convert_reference_checkpoint(path, zoo)
    for name in ("text_encoder", "bert_encoder"):
        for (ka, va), (kb, vb) in zip(sorted(flatten(zoo[name]).items()),
                                      sorted(flatten(out[name]).items())):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_array_equal(
        np.asarray(flatten(out["diffusion"]["transformer"])["to_out.1.bias"]),
        np.asarray(flatten(zoo["diffusion"]["transformer"])["to_out.1.bias"]))


def test_shape_adaptation_rules():
    """Grown-vocab embedding tables copy + pad with the last row
    (ref: models.py:1113-1215)."""
    from styletts2_tpu.train.torch_compat import match_state_dict

    cur = {"embedding.weight": np.zeros((10, 4), np.float32)}
    loaded = {"module.embedding.weight": np.arange(32, dtype=np.float32).reshape(8, 4)}
    out = match_state_dict(cur, loaded, verbose=False)
    got = out["embedding.weight"]
    np.testing.assert_array_equal(got[:8], loaded["module.embedding.weight"])
    np.testing.assert_array_equal(got[8], loaded["module.embedding.weight"][-1])
    np.testing.assert_array_equal(got[9], loaded["module.embedding.weight"][-1])

    # incompatible shapes keep current
    cur2 = {"w": np.ones((3, 3), np.float32)}
    out2 = match_state_dict(cur2, {"w": np.zeros((2, 2), np.float32)}, verbose=False)
    np.testing.assert_array_equal(out2["w"], cur2["w"])


def test_plbert_t7_conversion(tmp_path):
    """PL-BERT step_*.t7 layout: module.encoder.* prefixes."""
    flat = {"module.encoder.embeddings.word_embeddings.weight": torch.zeros(5, 3),
            "module.encoder.embeddings.position_ids": torch.arange(4)[None],
            "module.other.junk": torch.ones(2)}
    path = str(tmp_path / "step_100.t7")
    torch.save({"net": flat}, path)
    out = ckpt.convert_plbert_checkpoint(path)
    assert "embeddings" in out
    assert "position_ids" not in out["embeddings"]
    assert out["embeddings"]["word_embeddings"]["weight"].shape == (5, 3)


def test_load_pretrained_encoders(tmp_path):
    """The CLI encoder wiring: ASR/F0/PL-BERT/Whisper fixtures land in the
    zoo (ref: train_first.py:208-227, Utils/PLBERT/util.py:82-142,
    losses.py:204-214)."""
    import dataclasses

    from styletts2_tpu.testing import tiny_config

    zoo, _ = tiny_zoo()
    orig = {k: flatten(zoo[k]) for k in
            ("text_aligner", "pitch_extractor", "bert", "slm_encoder")}

    def shifted(mod):
        out = {}
        for k, v in flatten(mod).items():
            a = np.asarray(v)
            out[k] = torch.tensor(a + 1.0 if np.issubdtype(a.dtype, np.floating)
                                  else a)
        return out

    torch.save({"model": shifted(zoo["text_aligner"])}, tmp_path / "asr.pth")
    torch.save({"net": shifted(zoo["pitch_extractor"])}, tmp_path / "jdc.t7")
    plbert_dir = tmp_path / "plbert"
    plbert_dir.mkdir()
    bert_state = {"module.encoder." + k: v
                  for k, v in shifted(zoo["bert"]).items()}
    torch.save({"net": bert_state}, plbert_dir / "step_100.t7")
    # an older checkpoint that must NOT be picked
    stale = {"module.encoder." + k: v * 0
             for k, v in shifted(zoo["bert"]).items()}
    torch.save({"net": stale}, plbert_dir / "step_50.t7")
    slm_state = {"encoder." + k: v for k, v in shifted(zoo["slm_encoder"]).items()}
    torch.save(slm_state, tmp_path / "whisper.pt")

    cfg = tiny_config()
    mp = dataclasses.replace(
        cfg.model_params,
        slm=dataclasses.replace(cfg.model_params.slm,
                                model=str(tmp_path / "whisper.pt")))
    cfg = dataclasses.replace(
        cfg, model_params=mp,
        ASR_path=str(tmp_path / "asr.pth"), F0_path=str(tmp_path / "jdc.t7"),
        PLBERT_dir=str(plbert_dir))

    loaded = ckpt.load_pretrained_encoders(cfg, zoo)
    assert set(loaded) == {"text_aligner", "pitch_extractor", "bert",
                           "slm_encoder"}
    assert loaded["bert"].endswith("step_100.t7")
    for name in loaded:
        for k, v in flatten(zoo[name]).items():
            a0 = np.asarray(orig[name][k])
            if np.issubdtype(a0.dtype, np.floating):
                np.testing.assert_allclose(np.asarray(v), a0 + 1.0, atol=1e-6,
                                           err_msg=f"{name}.{k}")

    # a configured-but-missing source must raise, not train random encoders
    bad = dataclasses.replace(cfg, ASR_path=str(tmp_path / "missing.pth"))
    with pytest.raises(FileNotFoundError):
        ckpt.load_pretrained_encoders(bad, zoo)
    # ... unless explicitly allowed (smoke-test escape hatch)
    ckpt.load_pretrained_encoders(bad, zoo, allow_random=True)
