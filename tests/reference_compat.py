"""Shims that make the reference torch implementation importable for parity
tests.

The image ships the reference at ``/root/reference`` but not all of its
dependencies (``munch``, ``torchaudio``); both are small API surfaces that we
re-implement here on top of plain torch so the *reference's own code* can run
unmodified and serve as the golden baseline for numerics tests
(BASELINE.md: waveform allclose atol 1e-2).

Nothing in this module is shipped; it is test scaffolding only.
"""

from __future__ import annotations

import math
import sys
import types
from functools import lru_cache

REFERENCE_ROOT = "/root/reference"


def _install_munch() -> None:
    if "munch" in sys.modules:
        return

    class Munch(dict):
        """Minimal attribute-access dict matching the munch package API used
        by the reference (attribute get/set + ``fromDict``)."""

        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError as exc:  # pragma: no cover
                raise AttributeError(name) from exc

        def __setattr__(self, name, value):
            self[name] = value

        @classmethod
        def fromDict(cls, d):
            def build(v):
                if isinstance(v, dict):
                    return cls({k: build(x) for k, x in v.items()})
                if isinstance(v, (list, tuple)):
                    return type(v)(build(x) for x in v)
                return v

            return build(dict(d))

    mod = types.ModuleType("munch")
    mod.Munch = Munch
    sys.modules["munch"] = mod


def _install_torchaudio() -> None:
    if "torchaudio" in sys.modules:
        return
    import torch

    def create_dct(n_mfcc: int, n_mels: int, norm):
        """torchaudio.functional.create_dct: DCT-II matrix (n_mels, n_mfcc)."""
        n = torch.arange(float(n_mels))
        k = torch.arange(float(n_mfcc)).unsqueeze(1)
        dct = torch.cos(math.pi / float(n_mels) * (n + 0.5) * k)  # (n_mfcc, n_mels)
        if norm is None:
            dct *= 2.0
        else:
            assert norm == "ortho"
            dct[0] *= 1.0 / math.sqrt(2.0)
            dct *= math.sqrt(2.0 / float(n_mels))
        return dct.t()

    def _hz_to_mel_htk(freq):
        return 2595.0 * math.log10(1.0 + freq / 700.0)

    def _mel_to_hz_htk(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
        """torchaudio htk-scale, unnormalized triangular filterbank
        (freqs, n_mels)."""
        all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
        m_min = _hz_to_mel_htk(f_min)
        m_max = _hz_to_mel_htk(f_max)
        m_pts = torch.linspace(m_min, m_max, n_mels + 2)
        f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
        f_diff = f_pts[1:] - f_pts[:-1]                          # (n_mels + 1,)
        slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)     # (n_freqs, n_mels + 2)
        down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
        up_slopes = slopes[:, 2:] / f_diff[1:]
        fb = torch.clamp(torch.min(down_slopes, up_slopes), min=0.0)
        return fb

    class MelSpectrogram(torch.nn.Module):
        """torchaudio.transforms.MelSpectrogram subset: center/reflect STFT,
        power-2 magnitude, htk mel scale, no filterbank normalization."""

        def __init__(self, sample_rate=16000, n_fft=400, win_length=None,
                     hop_length=None, f_min=0.0, f_max=None, n_mels=128,
                     window_fn=torch.hann_window, power=2.0, **kwargs):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length if win_length is not None else n_fft
            self.hop_length = hop_length if hop_length is not None else self.win_length // 2
            self.power = power
            self.register_buffer("window", window_fn(self.win_length))
            fb = melscale_fbanks(n_fft // 2 + 1, f_min,
                                 f_max if f_max is not None else float(sample_rate // 2),
                                 n_mels, sample_rate)
            self.register_buffer("fb", fb)

        def forward(self, waveform):
            spec = torch.stft(waveform, self.n_fft, self.hop_length,
                              self.win_length, self.window, center=True,
                              pad_mode="reflect", normalized=False,
                              onesided=True, return_complex=True)
            spec = spec.abs() ** self.power                      # (..., freq, time)
            mel = torch.matmul(spec.transpose(-1, -2), self.fb).transpose(-1, -2)
            return mel

    class Resample(torch.nn.Module):
        """torchaudio.transforms.Resample: gcd polyphase with hann-windowed
        sinc kernel (lowpass_filter_width=6, rolloff=0.99)."""

        def __init__(self, orig_freq=16000, new_freq=16000,
                     lowpass_filter_width=6, rolloff=0.99, **kwargs):
            super().__init__()
            self.orig_freq = int(orig_freq)
            self.new_freq = int(new_freq)
            gcd = math.gcd(self.orig_freq, self.new_freq)
            self.gcd = gcd
            if self.orig_freq != self.new_freq:
                kernel, width = self._kernel(self.orig_freq // gcd,
                                             self.new_freq // gcd,
                                             lowpass_filter_width, rolloff)
                self.register_buffer("kernel", kernel)
                self.width = width

        @staticmethod
        def _kernel(orig_freq, new_freq, lowpass_filter_width, rolloff):
            base_freq = min(orig_freq, new_freq) * rolloff
            width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
            idx = torch.arange(-width, width + orig_freq,
                               dtype=torch.float64)[None, None] / orig_freq
            t = torch.arange(0, -new_freq, -1,
                             dtype=torch.float64)[:, None, None] / new_freq + idx
            t *= base_freq
            t = t.clamp_(-lowpass_filter_width, lowpass_filter_width)
            window = torch.cos(t * math.pi / lowpass_filter_width / 2) ** 2
            t *= math.pi
            scale = base_freq / orig_freq
            kernels = torch.where(t == 0, torch.tensor(1.0, dtype=torch.float64),
                                  t.sin() / t)
            kernels *= window * scale
            return kernels.to(torch.float32), width

        def forward(self, waveform):
            if self.orig_freq == self.new_freq:
                return waveform
            orig = self.orig_freq // self.gcd
            new = self.new_freq // self.gcd
            shape = waveform.shape
            wav = waveform.reshape(-1, shape[-1])
            num_wavs, length = wav.shape
            target_length = int(math.ceil(new * length / orig))
            wav = torch.nn.functional.pad(wav, (self.width, self.width + orig))
            resampled = torch.nn.functional.conv1d(wav[:, None], self.kernel,
                                                   stride=orig)
            resampled = resampled.transpose(1, 2).reshape(num_wavs, -1)
            resampled = resampled[..., :target_length]
            return resampled.reshape(shape[:-1] + resampled.shape[-1:])

    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        # transformers probes importlib.util.find_spec("torchaudio"), which
        # raises on modules with __spec__ = None — give the stubs a real spec.
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    ta = _mod("torchaudio")
    func = _mod("torchaudio.functional")
    trans = _mod("torchaudio.transforms")
    func.create_dct = create_dct
    func.melscale_fbanks = melscale_fbanks
    trans.MelSpectrogram = MelSpectrogram
    trans.Resample = Resample
    ta.functional = func
    ta.transforms = trans
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = func
    sys.modules["torchaudio.transforms"] = trans


def _install_einops_exts() -> None:
    if "einops_exts" in sys.modules:
        return
    from einops import rearrange

    def rearrange_many(tensors, pattern, **kwargs):
        return [rearrange(t, pattern, **kwargs) for t in tensors]

    mod = types.ModuleType("einops_exts")
    mod.rearrange_many = rearrange_many
    sys.modules["einops_exts"] = mod


@lru_cache(maxsize=1)
def load_reference():
    """Import the reference implementation and return it as a namespace."""
    _install_munch()
    _install_torchaudio()
    _install_einops_exts()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    ns = types.SimpleNamespace()
    import models as ref_models  # noqa: E402  (from /root/reference)
    from Modules import istftnet as ref_istftnet  # noqa: E402
    from Modules import hifigan as ref_hifigan  # noqa: E402
    from Modules.diffusion import modules as ref_diff_modules  # noqa: E402
    from Modules.diffusion import sampler as ref_diff_sampler  # noqa: E402
    from Modules import discriminators as ref_discriminators  # noqa: E402
    import losses as ref_losses  # noqa: E402
    from Utils.ASR import models as ref_asr_models  # noqa: E402
    from Utils.JDC import model as ref_jdc_model  # noqa: E402

    ns.models = ref_models
    ns.istftnet = ref_istftnet
    ns.hifigan = ref_hifigan
    ns.diff_modules = ref_diff_modules
    ns.diff_sampler = ref_diff_sampler
    ns.discriminators = ref_discriminators
    ns.losses = ref_losses
    ns.asr_models = ref_asr_models
    ns.jdc_model = ref_jdc_model
    return ns


def to_jax_params(torch_module, current_params=None, module_name=""):
    """Reference torch module -> our nested numpy params pytree."""
    from styletts2_tpu.train.torch_compat import convert_module_state

    return convert_module_state(torch_module.state_dict(),
                                current_params=current_params,
                                module_name=module_name)
