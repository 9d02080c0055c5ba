import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax.numpy as jnp

from styletts2_tpu.nn import conv as jconv
from styletts2_tpu.nn import norm as jnorm
from styletts2_tpu.nn import param_norm as jpn
import styletts2_tpu.nn.lstm as jlstm
from styletts2_tpu.nn.activations import snake, leaky_relu


RNG = np.random.default_rng(42)


def rnd(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def to_j(x):
    return jnp.asarray(x)


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), b.detach().numpy() if torch.is_tensor(b) else b,
                               atol=atol, rtol=rtol)


@pytest.mark.parametrize("stride,pad,dil,groups", [(1, 1, 1, 1), (2, 1, 1, 1), (1, 2, 2, 1), (1, 1, 1, 4)])
def test_conv1d(stride, pad, dil, groups):
    x = rnd(2, 8, 37)
    w = rnd(12, 8 // groups, 3)
    b = rnd(12)
    ours = jconv.conv1d(to_j(x), to_j(w), to_j(b), stride, pad, dil, groups)
    theirs = tF.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b), stride, pad, dil, groups)
    assert_close(ours, theirs, atol=1e-4)


@pytest.mark.parametrize("stride,pad", [((1, 1), (1, 4)), ((2, 2), 1), ((1, 2), (1, 4))])
def test_conv2d(stride, pad):
    x = rnd(2, 3, 20, 33)
    w = rnd(7, 3, 3, 9)
    b = rnd(7)
    ours = jconv.conv2d(to_j(x), to_j(w), to_j(b), stride, pad)
    theirs = tF.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b), stride, pad)
    assert_close(ours, theirs, atol=1e-4)


@pytest.mark.parametrize(
    "in_ch,out_ch,k,stride,pad,outpad,groups",
    [
        (8, 4, 20, 10, 5, 0, 1),    # istftnet upsample geometry
        (8, 8, 3, 2, 1, 1, 8),      # grouped "pool" transpose conv
        (6, 4, 10, 5, 3, 1, 1),     # hifigan odd-stride geometry
    ],
)
def test_conv_transpose1d(in_ch, out_ch, k, stride, pad, outpad, groups):
    x = rnd(2, in_ch, 25)
    w = rnd(in_ch, out_ch // groups, k)
    b = rnd(out_ch)
    ours = jconv.conv_transpose1d(to_j(x), to_j(w), to_j(b), stride, pad, outpad, groups)
    theirs = tF.conv_transpose1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                                 stride, pad, outpad, groups)
    assert ours.shape == tuple(theirs.shape)
    assert_close(ours, theirs, atol=1e-4)


def test_conv_transpose2d():
    x = rnd(2, 6, 9, 11)
    w = rnd(6, 4, 3, 3)
    b = rnd(4)
    ours = jconv.conv_transpose2d(to_j(x), to_j(w), to_j(b), (2, 2), 1, 1)
    theirs = tF.conv_transpose2d(torch.tensor(x), torch.tensor(w), torch.tensor(b), (2, 2), 1, 1)
    assert ours.shape == tuple(theirs.shape)
    assert_close(ours, theirs, atol=1e-4)


def test_avg_pools_and_interp():
    x = rnd(2, 4, 15)
    assert_close(jconv.avg_pool1d(to_j(x)), tF.avg_pool1d(torch.tensor(x), 2))
    x2 = rnd(2, 4, 9, 13)
    assert_close(jconv.avg_pool2d(to_j(x2)), tF.avg_pool2d(torch.tensor(x2), 2))
    assert_close(jconv.interpolate_nearest_2x(to_j(x)),
                 tF.interpolate(torch.tensor(x), scale_factor=2, mode="nearest"))


@pytest.mark.parametrize("scale", [0.3333333, 2.0, 300.0, 1.0 / 300.0])
def test_interpolate_linear(scale):
    t = 1500 if scale < 0.01 else (60 if scale < 1 else 20)
    x = rnd(2, 3, t)
    ours = jconv.interpolate_linear(to_j(x), scale_factor=scale)
    theirs = tF.interpolate(torch.tensor(x), scale_factor=scale, mode="linear")
    assert ours.shape == tuple(theirs.shape)
    assert_close(ours, theirs, atol=1e-4)


def test_interpolate_linear_size():
    x = rnd(2, 3, 50)
    ours = jconv.interpolate_linear(to_j(x), out_len=77)
    theirs = tF.interpolate(torch.tensor(x), size=77, mode="linear", align_corners=False)
    assert_close(ours, theirs, atol=1e-4)


def test_instance_norm_and_adain():
    x = rnd(3, 10, 25)
    ours = jnorm.instance_norm(to_j(x))
    theirs = tF.instance_norm(torch.tensor(x))
    assert_close(ours, theirs, atol=1e-4)

    # AdaIN1d vs explicit torch composition
    s = rnd(3, 6)
    fc_w, fc_b = rnd(20, 6), rnd(20)
    params = {"fc": {"weight": to_j(fc_w), "bias": to_j(fc_b)}}
    ours = jnorm.adain1d(params, to_j(x), to_j(s))
    h = torch.tensor(s) @ torch.tensor(fc_w).T + torch.tensor(fc_b)
    gamma, beta = h.chunk(2, dim=1)
    theirs = (1 + gamma[:, :, None]) * tF.instance_norm(torch.tensor(x)) + beta[:, :, None]
    assert_close(ours, theirs, atol=1e-4)


def test_layer_norms():
    x = rnd(2, 8, 13)
    g, b = rnd(8), rnd(8)
    ours = jnorm.layer_norm_channels(to_j(x), to_j(g), to_j(b))
    xt = torch.tensor(x).transpose(1, -1)
    theirs = tF.layer_norm(xt, (8,), torch.tensor(g), torch.tensor(b)).transpose(1, -1)
    assert_close(ours, theirs, atol=1e-4)

    # AdaLayerNorm vs reference math (ref: models.py:528-547) on (B, C, T)
    s = rnd(2, 5)
    fc_w, fc_b = rnd(16, 5), rnd(16)
    params = {"fc": {"weight": to_j(fc_w), "bias": to_j(fc_b)}}
    ours = jnorm.ada_layer_norm(params, to_j(np.swapaxes(x, 1, 2)), to_j(s))
    h = torch.tensor(s) @ torch.tensor(fc_w).T + torch.tensor(fc_b)
    gamma, beta = h[:, None, :].chunk(2, dim=-1)
    base = tF.layer_norm(torch.tensor(np.swapaxes(x, 1, 2)), (8,))
    theirs = (1 + gamma) * base + beta
    assert_close(ours, theirs, atol=1e-4)


def test_weight_norm():
    conv = tnn.Conv1d(8, 12, 3)
    conv = tnn.utils.weight_norm(conv)
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    params = {"weight_v": to_j(sd["weight_v"]), "weight_g": to_j(sd["weight_g"])}
    ours = jpn.weight_norm_kernel(params)
    with torch.no_grad():
        theirs = conv.weight_v * (conv.weight_g / conv.weight_v.norm(dim=(1, 2), keepdim=True))
    assert_close(ours, theirs, atol=1e-5)


def test_spectral_norm_eval_and_train():
    torch.manual_seed(0)
    conv = tnn.utils.spectral_norm(tnn.Conv2d(4, 6, 3, padding=1))
    x = torch.tensor(rnd(2, 4, 8, 8))
    # One training forward updates (u, v) then uses them
    conv.train()
    theirs = conv(x)
    sd0 = {k: v.detach().numpy().copy() for k, v in conv.state_dict().items()}

    # Reproduce from the PRE-forward state: torch re-runs power iteration
    conv2 = tnn.utils.spectral_norm(tnn.Conv2d(4, 6, 3, padding=1))
    conv2.load_state_dict(conv.state_dict())
    conv2.eval()  # eval: no power-iteration update, sigma from stored u,v
    theirs_eval = conv2(x)

    params = {
        "weight_orig": to_j(sd0["weight_orig"]),
        "weight_u": to_j(sd0["weight_u"]),
        "weight_v": to_j(sd0["weight_v"]),
    }
    w_eval, _ = jpn.spectral_norm_kernel(params, n_power_iterations=0)
    ours_eval = jconv.conv2d(to_j(x.numpy()), w_eval, to_j(sd0["bias"]), padding=1)
    assert_close(ours_eval, theirs_eval, atol=1e-4)


def test_lstm_unidirectional():
    torch.manual_seed(1)
    t_lstm = tnn.LSTM(6, 5, 1, batch_first=True)
    x = rnd(3, 11, 6)
    theirs, _ = t_lstm(torch.tensor(x))
    params = {k: to_j(v.detach().numpy()) for k, v in t_lstm.state_dict().items()}
    ours = jlstm.lstm(params, to_j(x))
    assert_close(ours, theirs, atol=1e-5)


def test_bilstm_packed_semantics():
    torch.manual_seed(2)
    t_lstm = tnn.LSTM(6, 5, 1, batch_first=True, bidirectional=True)
    x = rnd(4, 12, 6)
    lengths = np.array([12, 7, 3, 9])
    packed = tnn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), lengths, batch_first=True, enforce_sorted=False)
    out, _ = t_lstm(packed)
    theirs, _ = tnn.utils.rnn.pad_packed_sequence(out, batch_first=True, total_length=12)
    params = {k: to_j(v.detach().numpy()) for k, v in t_lstm.state_dict().items()}
    ours = jlstm.bilstm(params, to_j(x), jnp.asarray(lengths))
    assert_close(ours, theirs, atol=1e-5)


def test_lstm_cell_step():
    torch.manual_seed(3)
    cell = tnn.LSTMCell(6, 5)
    x, h, c = rnd(2, 6), rnd(2, 5), rnd(2, 5)
    th, tc = cell(torch.tensor(x), (torch.tensor(h), torch.tensor(c)))
    params = {k: to_j(v.detach().numpy()) for k, v in cell.state_dict().items()}
    oh, oc = jlstm.lstm_step(params, to_j(x), to_j(h), to_j(c))
    assert_close(oh, th, atol=1e-5)
    assert_close(oc, tc, atol=1e-5)


def test_activations():
    x = rnd(2, 4, 9)
    assert_close(leaky_relu(to_j(x), 0.2), tF.leaky_relu(torch.tensor(x), 0.2))
    a = np.abs(rnd(1, 4, 1)) + 0.5
    ours = snake(to_j(x), to_j(a))
    xt, at = torch.tensor(x), torch.tensor(a)
    theirs = xt + (1 / at) * torch.sin(at * xt) ** 2
    assert_close(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("ci,co,k,d,t,fold", [
    (32, 32, 11, 5, 97, 4), (64, 64, 7, 3, 100, 2), (16, 16, 3, 1, 64, 8)])
def test_conv1d_folded_matches_torch(ci, co, k, d, t, fold):
    """Channel-folded small-C conv (the HiFi-GAN MXU fix) vs torch conv1d."""
    pad = (k * d - d) // 2
    x = rnd(2, ci, t)
    w = rnd(co, ci, k) * 0.05
    b = rnd(co)
    ref = tF.conv1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                    padding=pad, dilation=d)
    got = jconv.conv1d_folded(to_j(x), to_j(w), to_j(b), dilation=d, fold=fold)
    assert_close(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("ci,co,u,k,p,op", [
    (64, 32, 10, 20, 5, 0), (32, 16, 6, 12, 3, 0),
    (64, 32, 5, 10, 3, 1), (16, 8, 3, 6, 2, 1)])
def test_conv_transpose1d_subpixel_matches_torch(ci, co, u, k, p, op):
    """Subpixel-matmul transposed conv (vocoder upsamplers) vs torch."""
    x = rnd(2, ci, 9)
    w = rnd(ci, co, k) * 0.05
    b = rnd(co)
    ref = tF.conv_transpose1d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                              stride=u, padding=p, output_padding=op)
    got = jconv.conv_transpose1d_subpixel(to_j(x), to_j(w), to_j(b),
                                          stride=u, padding=p,
                                          output_padding=op)
    assert_close(got, ref, atol=2e-5, rtol=1e-4)


def test_snake_polynomial_matches_exact_form():
    """Polynomial snake vs x + sin^2(alpha x)/alpha, values and gradients."""
    import jax

    x = to_j(rnd(3, 8, 50) * 30.0)   # large args stress the range reduction
    alpha = to_j(np.abs(rnd(1, 8, 1)) + 0.3)
    exact = x + (1.0 / alpha) * jnp.square(jnp.sin(alpha * x))
    np.testing.assert_allclose(snake(x, alpha), exact, atol=2e-5, rtol=1e-5)
    g_poly = jax.grad(lambda v: jnp.sum(snake(v, alpha)))(x)
    g_exact = jax.grad(
        lambda v: jnp.sum(v + (1.0 / alpha) * jnp.square(jnp.sin(alpha * v))))(x)
    np.testing.assert_allclose(g_poly, g_exact, atol=1e-4, rtol=1e-4)


def test_sin2pi_and_sin_poly_match_exact():
    """Range-reduced polynomial sin vs jnp.sin: phase-accumulator turns
    (monotone, up to ~1e2) and radians network outputs, values + grads."""
    import jax
    from styletts2_tpu.nn.activations import sin2pi, sin_poly

    turns = to_j(np.cumsum(np.abs(rnd(2, 9, 400)) * 0.25, axis=-1))
    # 1e-4: at ~1e2 turns the *comparison baseline* jnp.sin(2*pi*r) itself
    # carries the f32 rounding of the 2*pi multiply (~r*2pi*eps); sin2pi
    # reduces the turns value before any scaling so it has no such term.
    np.testing.assert_allclose(sin2pi(turns), jnp.sin(2.0 * np.pi * turns),
                               atol=1e-4, rtol=1e-4)
    x = to_j(rnd(3, 11, 64) * 20.0)
    np.testing.assert_allclose(sin_poly(x), jnp.sin(x), atol=2e-5, rtol=1e-4)
    g_poly = jax.grad(lambda v: jnp.sum(sin_poly(v)))(x)
    g_exact = jax.grad(lambda v: jnp.sum(jnp.sin(v)))(x)
    np.testing.assert_allclose(g_poly, g_exact, atol=1e-4, rtol=1e-4)
