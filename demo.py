#!/usr/bin/env python
"""Demo CLI — the notebook inference flows as a script
(ref: Demo/Inference_LJSpeech.ipynb, Demo/Inference_LibriTTS.ipynb).

Examples:
  # LJSpeech, pre-phonemized input
  python demo.py --ckpt second_stage.npz --phonemes "ðɪs ɪz ə tɛst ." --out out.wav

  # reference .pth checkpoint + raw text (needs phonemizer/espeak)
  python demo.py --ckpt epoch_2nd_00100.pth --text "This is a test." --out out.wav

  # multispeaker zero-shot with a reference clip
  python demo.py --config configs/libritts.yml --ckpt ms.npz \
      --text "Hello." --ref_audio speaker.wav --alpha 0.3 --beta 0.7

  # long form with style carry-over
  python demo.py --ckpt ckpt.npz --text "First sentence. Second one." --long_form
"""

import argparse
import struct
import time
import wave as wave_mod

import numpy as np


def write_wav(path: str, wav: np.ndarray, sr: int = 24000):
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave_mod.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/ljspeech.yml")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--text", default=None, help="raw text (needs phonemizer)")
    ap.add_argument("--phonemes", default=None, help="pre-phonemized input")
    ap.add_argument("--out", default="out.wav")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--embedding_scale", type=float, default=1.0)
    ap.add_argument("--ref_audio", default=None)
    ap.add_argument("--alpha", type=float, default=0.3)
    ap.add_argument("--beta", type=float, default=0.7)
    ap.add_argument("--long_form", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    if not (args.text or args.phonemes):
        ap.error("provide --text or --phonemes")

    import jax
    import jax.numpy as jnp

    from styletts2_tpu.config import load_config
    from styletts2_tpu.infer import InferenceEngine
    from styletts2_tpu.models.plbert import PLBertConfig
    from styletts2_tpu.models.zoo import build_zoo
    from styletts2_tpu.train.checkpoint import (
        convert_reference_checkpoint, load_checkpoint, zoo_to_device)
    from styletts2_tpu.utils import cast_pytree, rtf

    cfg = load_config(args.config)
    zoo = jax.jit(lambda k: build_zoo(k, cfg.model_params, include_slm=False))(
        jax.random.PRNGKey(0))
    sigma_data = cfg.model_params.diffusion.dist.sigma_data
    if args.ckpt:
        if args.ckpt.endswith(".pth"):
            zoo.update(convert_reference_checkpoint(args.ckpt, zoo))
        else:
            params, _, _, _, _ = load_checkpoint(args.ckpt, zoo)
            zoo.update(params)
    zoo = zoo_to_device(zoo)
    if args.bf16:
        zoo = cast_pytree(zoo, jnp.bfloat16)

    engine = InferenceEngine(zoo, cfg.model_params, PLBertConfig(),
                             sigma_data=sigma_data)
    if args.bf16:
        engine.compute_dtype = jnp.bfloat16

    if args.phonemes:
        phonemes = args.phonemes
    elif args.text:
        from styletts2_tpu.text.phonemize import phonemize

        phonemes = phonemize(args.text)
    else:
        ap.error("provide --text or --phonemes")

    ref_s = None
    if args.ref_audio:
        from styletts2_tpu.audio.mel import DATASET_MEL, log_mel_spectrogram
        from styletts2_tpu.data.dataset import _read_wav, _resample_np
        from styletts2_tpu.models.style_encoder import style_encoder_apply

        wav_ref, sr = _read_wav(args.ref_audio)
        wav_ref = _resample_np(wav_ref, sr, 24000)
        mel = log_mel_spectrogram(jnp.asarray(wav_ref[None]), DATASET_MEL)
        ref_acoustic = style_encoder_apply(zoo["style_encoder"], mel[:, None])
        ref_prosodic = style_encoder_apply(zoo["predictor_encoder"], mel[:, None])
        ref_s = np.concatenate([np.asarray(ref_acoustic), np.asarray(ref_prosodic)], axis=-1)

    key = jax.random.PRNGKey(args.seed)
    t0 = time.perf_counter()
    if args.long_form:
        sentences = [s.strip() for s in phonemes.split(".") if s.strip()]
        wav = engine.long_form([s + " ." for s in sentences], key=key,
                               diffusion_steps=args.steps,
                               embedding_scale=args.embedding_scale)
    else:
        wav = engine.synthesize(phonemes, key=key, diffusion_steps=args.steps,
                                embedding_scale=args.embedding_scale,
                                ref_s=ref_s, alpha=args.alpha, beta=args.beta)
    dt = time.perf_counter() - t0
    write_wav(args.out, wav)
    print(f"wrote {args.out}: {len(wav)/24000:.2f}s audio in {dt:.2f}s "
          f"(RTF {rtf(dt, len(wav)):.4f})")


if __name__ == "__main__":
    main()
