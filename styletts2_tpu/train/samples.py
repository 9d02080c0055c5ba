"""Training-time qualitative audio dumps (ref: train_first.py:520-545,
train_second.py:1086-1193).

Per epoch the reference writes three audios per sample to TensorBoard:
ground truth, reconstruction with GT duration/F0, and prediction with
predicted duration.  Here the same trio is synthesized in one jitted pass
and written as wav files under ``<log_dir>/samples/epoch_<n>/``.
"""

from __future__ import annotations

import os
import wave as wave_mod
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import DATASET_MEL, log_mel_spectrogram, log_norm
from ..models.decoder import hifigan, istftnet
from ..models.jdc import jdc_apply
from ..models.plbert import plbert_apply
from ..models.predictor import prosody_duration_apply, prosody_f0n_apply
from ..models.style_encoder import style_encoder_apply
from ..models.text_encoder import text_encoder_apply
from ..models import common as cm
from ..nn.linear import linear
from ..ops.alignment import hard_alignment
from .stage1 import compute_alignment


def write_wav(path: str, wav: np.ndarray, sr: int = 24000):
    pcm = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def generate_samples(zoo: Dict, configs: Dict, batch: Dict, out_dir: str,
                     key=None, max_samples: int = 2, frame_capacity: int = 400):
    """Ground-truth-duration reconstruction + predicted-duration synthesis
    for the first ``max_samples`` items of a validation batch."""
    os.makedirs(out_dir, exist_ok=True)
    mp = configs["model"]
    decoder_mod = istftnet if mp.decoder.type == "istftnet" else hifigan
    key = key if key is not None else jax.random.PRNGKey(0)

    mels = log_mel_spectrogram(jnp.asarray(batch["waves"]), DATASET_MEL)
    mels = mels[..., : (mels.shape[-1] // 2) * 2]
    texts = jnp.asarray(batch["texts"])
    text_lengths = jnp.asarray(batch["input_lengths"])
    mel_lengths = jnp.asarray(batch["mel_input_length"])

    _, _, _, mono = compute_alignment(zoo, mels, mel_lengths, texts,
                                      text_lengths, configs["asr"], False, None)
    t_en = text_encoder_apply(zoo["text_encoder"], texts, text_lengths)
    s = style_encoder_apply(zoo["style_encoder"], mels[:, None], mel_lengths)
    s_dur = style_encoder_apply(zoo["predictor_encoder"], mels[:, None], mel_lengths)

    # --- reconstruction with GT duration/F0 ---
    asr = t_en @ mono
    f0, _, _ = jdc_apply(zoo["pitch_extractor"], mels[:, None], configs["jdc"])
    n = log_norm(mels)
    # asr from the aligner is already at the decoder's en (mel/2) rate
    y_rec = decoder_mod.decoder_apply(zoo["decoder"], mp.decoder, asr, f0, n, s)

    # --- prediction with predicted duration ---
    text_pad = cm.length_to_mask(text_lengths, texts.shape[1])
    bert_dur = plbert_apply(zoo["bert"], texts, (~text_pad).astype(jnp.int32),
                            configs["plbert"])
    d_en = jnp.swapaxes(linear(bert_dur, zoo["bert_encoder"]["weight"],
                               zoo["bert_encoder"]["bias"]), 1, 2)
    dur_logits, _ = prosody_duration_apply(zoo["predictor"], d_en, s_dur,
                                           text_lengths, mono, mp.n_layer)
    pred_dur = jnp.maximum(jnp.round(jax.nn.sigmoid(dur_logits).sum(-1)), 1.0)
    pred_dur = jnp.where(~text_pad, pred_dur, 0.0).astype(jnp.int32)
    aln = hard_alignment(pred_dur, frame_capacity,
                         (~text_pad).astype(jnp.float32))
    _, p_full = prosody_duration_apply(zoo["predictor"], d_en, s_dur,
                                       text_lengths, aln, mp.n_layer)
    f0_pred, n_pred = prosody_f0n_apply(zoo["predictor"], p_full, s_dur)
    en_pred = t_en @ aln
    y_pred = decoder_mod.decoder_apply(zoo["decoder"], mp.decoder, en_pred,
                                       f0_pred, n_pred, s)

    waves = np.asarray(batch["waves"])
    frames_pred = np.asarray(pred_dur.sum(axis=1))
    for i in range(min(max_samples, waves.shape[0])):
        n_gt = int(batch["mel_input_length"][i]) * 300
        write_wav(os.path.join(out_dir, f"{i}_gt.wav"), waves[i, :n_gt])
        write_wav(os.path.join(out_dir, f"{i}_rec.wav"),
                  np.asarray(y_rec)[i, 0, : n_gt * 1])
        write_wav(os.path.join(out_dir, f"{i}_pred.wav"),
                  np.asarray(y_pred)[i, 0, : int(frames_pred[i]) * 600])
        write_attention_figure(
            os.path.join(out_dir, f"{i}_attn.png"),
            np.asarray(mono)[i, : int(text_lengths[i]),
                             : int(batch["mel_input_length"][i]) // 2])


def write_attention_figure(path: str, attn: np.ndarray) -> None:
    """Monotonic-alignment heatmap per sample, the counterpart of the
    reference's per-epoch attention TensorBoard figures
    (ref: train_first.py:525-526 get_image(attn)).

    Written as a PNG via matplotlib when available, else as ``.npy``."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 3))
        ax.imshow(attn, aspect="auto", origin="lower", interpolation="nearest")
        ax.set_xlabel("mel/2 frames")
        ax.set_ylabel("tokens")
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
    except Exception:
        np.save(path.replace(".png", ".npy"), attn)
