import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from styletts2_tpu.ops.monotonic import maximum_path, mask_from_lens
from styletts2_tpu.ops.alignment import hard_alignment, gaussian_alignment


def numpy_maximum_path(value: np.ndarray, t_x: int, t_y: int) -> np.ndarray:
    """Direct transcription of the Cython maximum_path_each DP for testing."""
    v = value.copy().astype(np.float64)
    neg = -1e9
    for y in range(t_y):
        for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
            if x == y:
                v_cur = neg
            else:
                v_cur = v[x, y - 1] if y > 0 else neg
            if x == 0:
                v_prev = 0.0 if y == 0 else neg
            else:
                v_prev = v[x - 1, y - 1] if y > 0 else neg
            v[x, y] = max(v_prev, v_cur) + v[x, y]
    path = np.zeros((value.shape[0], value.shape[1]), dtype=np.int32)
    index = t_x - 1
    for y in range(t_y - 1, -1, -1):
        path[index, y] = 1
        if index != 0 and (index == y or (y > 0 and v[index, y - 1] < v[index - 1, y - 1])):
            index -= 1
    return path


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_maximum_path_matches_cython_semantics(seed):
    rng = np.random.default_rng(seed)
    b, t_text, t_mel = 3, 11, 17
    values = rng.standard_normal((b, t_text, t_mel)).astype(np.float32)
    text_lens = np.array([11, 6, 9])
    mel_lens = np.array([17, 12, 9])

    got = np.asarray(maximum_path(jnp.asarray(values),
                                  jnp.asarray(text_lens), jnp.asarray(mel_lens)))
    for i in range(b):
        want = numpy_maximum_path(values[i], text_lens[i], mel_lens[i])
        np.testing.assert_array_equal(got[i, :, :mel_lens[i]].astype(np.int32),
                                      want[:, :mel_lens[i]],
                                      err_msg=f"sample {i}")
        # nothing outside the valid region
        assert got[i, :, mel_lens[i]:].sum() == 0

    # every valid frame picks exactly one token, path is monotonic
    for i in range(b):
        cols = got[i, :, :mel_lens[i]].argmax(axis=0)
        assert (np.diff(cols) >= 0).all() and (np.diff(cols) <= 1).all()
        assert cols[0] == 0 and cols[-1] == text_lens[i] - 1


def test_mask_from_lens():
    m = np.asarray(mask_from_lens(jnp.array([2, 3]), jnp.array([4, 2]), 3, 5))
    assert m.shape == (2, 3, 5)
    assert m[0, :2, :4].all() and not m[0, 2:].any() and not m[0, :, 4:].any()


def test_hard_alignment():
    dur = jnp.array([[2, 3, 1], [1, 1, 1]])
    aln = np.asarray(hard_alignment(dur, 7))
    assert aln.shape == (2, 3, 7)
    np.testing.assert_array_equal(aln[0, 0], [1, 1, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(aln[0, 1], [0, 0, 1, 1, 1, 0, 0])
    np.testing.assert_array_equal(aln[0, 2], [0, 0, 0, 0, 0, 1, 0])
    # every covered frame has exactly one token
    assert (aln[0].sum(axis=0)[:6] == 1).all()


def test_gaussian_alignment_matches_reference_conv():
    """Vectorized Gaussian attention vs the reference's per-sample grouped
    conv construction (ref: Modules/slmadv.py:113-134)."""
    rng = np.random.default_rng(0)
    t_text, max_dur, sig = 5, 8, 1.5
    logits = rng.standard_normal((1, t_text, max_dur)).astype(np.float32)

    # reference computation (torch)
    s2s = torch.tensor(logits[0])
    x = torch.sigmoid(s2s)
    dur = x.sum(dim=-1)
    length = int(torch.round(x.sum()).item())
    t = torch.arange(0, length).unsqueeze(0).expand(t_text, length).float()
    loc = torch.cumsum(dur, dim=0) - dur / 2
    h = torch.exp(-0.5 * torch.square(t - (length - loc.unsqueeze(-1))) / sig ** 2)
    out = tF.conv1d(s2s.unsqueeze(0), h.unsqueeze(1), padding=h.shape[-1] - 1,
                    groups=t_text)[..., :length]
    want = tF.softmax(out.squeeze(0), dim=0).numpy()

    attn, lengths = gaussian_alignment(jnp.asarray(logits), jnp.array([t_text]),
                                       t_mel=length, sigma=sig)
    assert int(lengths[0]) == length
    np.testing.assert_allclose(np.asarray(attn)[0], want, atol=2e-5, rtol=1e-4)
