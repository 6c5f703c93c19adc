"""CLAP-score evaluation of generated audio against its prompts.

The reference conditions on CLAP (`lumina_audio/models/encoders/CLAP/`) but
ships no generation-eval harness; this module closes that loop the standard
way text-to-audio systems are scored: cosine similarity between the CLAP
text embedding of each prompt and the CLAP audio embedding of the generated
clip (`CLAPWrapper.compute_similarity` semantics, `CLAPWrapper.py:193-197`,
without the logit scale — the conventional "CLAP score").

Usage with real weights (first-weights-day checklist, docs/validation.md):

    from lumina_t2x_tpu.codecs.clap_audio import CLAPAudioEncoder, clap_score
    from lumina_t2x_tpu.codecs.text_encoders import CLAPTextEncoder
    audio_enc = CLAPAudioEncoder.from_clap_checkpoint("CLAP_weights_2022.pth")
    text_enc = CLAPTextEncoder.from_clap_checkpoint(
        "CLAP_weights_2022.pth", FlaxBertModel(...), tokenizer)
    report = clap_eval_directory(text_enc, audio_enc, "outputs/", "prompts.txt")
"""

from __future__ import annotations

import json
import os
import re
import wave
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _natural_key(name: str):
    """Sort key treating digit runs as numbers: 2.wav < 10.wav."""
    return [int(p) if p.isdigit() else p for p in re.split(r"(\d+)", name)]


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Mono float32 waveform in [-1, 1] + sample rate from a PCM WAV file
    (the inverse of `pipelines.audio_app.save_wav`). Multi-channel files are
    averaged to mono; 16/32-bit integer and 8-bit unsigned PCM supported."""
    with wave.open(path, "rb") as f:
        n_ch, sampwidth, sr = f.getnchannels(), f.getsampwidth(), f.getframerate()
        raw = f.readframes(f.getnframes())
    if sampwidth == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth} in {path}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, sr


def clap_scores(text_encoder, audio_encoder, wav_paths: Sequence[str],
                prompts: Sequence[str], batch_size: int = 8) -> np.ndarray:
    """Per-pair CLAP score (cosine of matched rows) for wav_paths[i] vs
    prompts[i]. Audio is resampled/tiled by the audio encoder; the
    deterministic crop keeps the metric reproducible."""
    if len(wav_paths) != len(prompts):
        raise ValueError(f"{len(wav_paths)} wavs vs {len(prompts)} prompts")
    from ..codecs.clap_audio import clap_score

    scores: List[np.ndarray] = []
    for lo in range(0, len(wav_paths), batch_size):
        chunk_paths = wav_paths[lo:lo + batch_size]
        chunk_prompts = list(prompts[lo:lo + batch_size])
        text_emb = np.asarray(text_encoder.embed(chunk_prompts))
        waves = [read_wav(p) for p in chunk_paths]
        # Group by (sample rate, length): uniform-format wavs (the common
        # case for one generation run) embed as a single batch; stragglers
        # fall back to per-file calls. Grouping keys must preserve order.
        audio_emb = np.empty((len(waves), text_emb.shape[-1]), np.float32)
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, (w, sr) in enumerate(waves):
            groups.setdefault((sr, w.shape[0]), []).append(i)
        for (sr, _), idxs in groups.items():
            emb = np.asarray(audio_encoder.embed(
                np.stack([waves[i][0] for i in idxs]), sr=sr))
            for row, i in enumerate(idxs):
                audio_emb[i] = emb[row]
        scores.append(np.asarray(clap_score(text_emb, audio_emb)))
    return np.concatenate(scores) if scores else np.zeros((0,), np.float32)


def clap_eval_directory(text_encoder, audio_encoder, wav_dir: str,
                        prompts: "str | Sequence[str]",
                        batch_size: int = 8) -> Dict:
    """Score every .wav in `wav_dir` (sorted) against its prompt.

    `prompts`: a list (one per wav, in natural-sorted filename order) or a
    path to a text file with one prompt per line. Returns a JSON-ready
    report: {"mean_clap_score", "n", "per_file": {name: score}}.

    Filenames are NATURAL-sorted (digit runs compared numerically), so
    `2.wav` pairs before `10.wav` — plain lexicographic sorting would
    silently mispair prompts for unpadded numeric stems.
    """
    wavs = sorted((f for f in os.listdir(wav_dir) if f.lower().endswith(".wav")),
                  key=_natural_key)
    if isinstance(prompts, str):
        with open(prompts) as f:
            prompts = [line.rstrip("\n") for line in f if line.strip()]
    if len(wavs) != len(prompts):
        raise ValueError(f"{len(wavs)} wavs in {wav_dir} vs {len(prompts)} prompts")
    scores = clap_scores(text_encoder, audio_encoder,
                         [os.path.join(wav_dir, w) for w in wavs], prompts,
                         batch_size=batch_size)
    return {
        "mean_clap_score": float(scores.mean()) if len(scores) else 0.0,
        "n": len(scores),
        "per_file": {w: float(s) for w, s in zip(wavs, scores)},
    }


def write_report(report: Dict, path: str) -> str:
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return path
