"""styletts2_tpu — a TPU-native StyleTTS2 framework built on JAX/XLA/Pallas.

A from-scratch reimplementation of the capabilities of the reference
StyleTTS2 training/inference repo (martinambrus/StyleTTS2), redesigned for
TPU hardware:

- pure-functional modules (param pytrees) compiled end-to-end with ``jax.jit``
- static-shape, mask-based computation (no dynamic packing / per-sample loops)
- ``lax.scan`` recurrences for LSTMs and diffusion sampling
- Pallas kernels for the monotonic-alignment DP and other hot ops
- multi-chip scaling via ``jax.sharding.Mesh`` + collectives (data parallel
  by default, optional model-axis sharding of the vocoder)

Layer map (mirrors reference SURVEY.md §1):
  text/     — phoneme dictionary + text cleaning        (ref: phoneme_dictionary.py, text_utils.py)
  audio/    — mel/STFT frontends, audio IO              (ref: meldataset.py preprocessing)
  nn/       — primitive layers (conv, lstm, norms)      (ref: scattered torch.nn use)
  models/   — the 13-net model zoo                      (ref: models.py, Modules/)
  losses/   — STFT/GAN/SLM losses                       (ref: losses.py, Modules/slmadv.py)
  train/    — optimizers, train steps, checkpointing    (ref: optimizers.py, train_*.py)
  parallel/ — mesh + sharding utilities                 (ref: HF Accelerate DDP)
  data/     — dataset/collate pipeline                  (ref: meldataset.py)
  ops/      — alignment + pallas kernels                (ref: monotonic_align Cython ext)
"""

__version__ = "0.1.0"
