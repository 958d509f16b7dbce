"""Corpus -> pipeline assembly.

Bridges the BZNSYP readers (tpuasr.data.bznsyp) to the static-shape
LengthBucketPipeline: utterance metadata (paths, token ids, wave length from
the WAV header) is scanned once; waveforms decode lazily per epoch in the
loader callback (reference behavior — data/dataloader.py decodes per
__getitem__; the native prefetcher in `native/` accelerates this when built).
"""

from __future__ import annotations

import wave as wave_mod
from dataclasses import dataclass

import numpy as np

from tpuasr.config import Config
from tpuasr.data.bznsyp import read_scp, read_text, read_wav
from tpuasr.data.pipeline import LengthBucketPipeline, Utterance
from tpuasr.text.tokenizer import Tokenizer


@dataclass
class UtteranceMeta:
    utt_id: str
    path: str
    tokens: np.ndarray
    wave_len: int


def _wav_frames(path: str) -> int:
    with wave_mod.open(path, "rb") as w:
        return w.getnframes()


def scan_split(
    wav_scp: str, text_file: str, tokenizer: Tokenizer, root: str = "",
    add_sos_eos: bool = True,
) -> list[UtteranceMeta]:
    """Build metadata for one split. Text becomes
    tokenizer(["<sos>"] + syllables + ["<eos>"]) (data/dataloader.py:66-67)."""
    wavs = read_scp(wav_scp, root)
    texts = read_text(text_file)
    items = []
    for utt, path in wavs.items():
        if utt not in texts:
            continue
        toks = texts[utt]
        if add_sos_eos:
            toks = ["<sos>"] + toks + ["<eos>"]
        items.append(
            UtteranceMeta(utt, path, np.asarray(tokenizer(toks), np.int32),
                          _wav_frames(path))
        )
    return items


def _load(meta: UtteranceMeta, wire_dtype: str = "float32") -> Utterance:
    if isinstance(meta, Utterance):
        return meta
    if wire_dtype == "int16":
        # raw 16-bit PCM pass-through: ZERO host conversion work, byte-exact
        # with the float path, half the transfer bytes — the int16 wire
        # format decoded on device by fbank (/32768)
        wave, _ = read_wav(meta.path, dtype="int16")
        return Utterance(meta.utt_id, wave, meta.tokens, len(wave))
    from tpuasr.utils import native

    if native.is_available():
        wave, _ = native.wav_read(meta.path, max_samples=meta.wave_len)
    else:
        wave, _ = read_wav(meta.path)
    return Utterance(meta.utt_id, wave, meta.tokens, len(wave))


def make_pipeline(
    items, cfg: Config, *, shuffle_seed: int | None = None, host_id: int = 0,
    num_hosts: int = 1, drop_remainder: bool = False,
) -> LengthBucketPipeline:
    d = cfg.data
    return LengthBucketPipeline(
        items,
        batch_size=d.batch_size,
        frame_buckets=d.frame_buckets,
        token_buckets=d.token_buckets,
        hop_length=cfg.feature.hop_length,
        pad_id=0,
        seed=d.shuffle_seed if shuffle_seed is None else shuffle_seed,
        host_id=host_id,
        num_hosts=num_hosts,
        loader=lambda m: _load(m, d.wire_dtype),
        drop_remainder=drop_remainder,
        batch_audio_frames=d.batch_audio_frames,
        batch_multiple=d.batch_multiple,
    )


def synthetic_pipeline(cfg: Config, n_utts: int = 64, seed: int = 0) -> LengthBucketPipeline:
    """Synthetic stand-in corpus (no BZNSYP on disk) for smoke runs, benches,
    and the reference-protocol training campaign (knobs: cfg.data.synth_*)."""
    from tpuasr.data.synthetic import synth_corpus

    d = cfg.data
    # long enough that even conv2d8 subsampling leaves T' >= 2U+1 (CTC feasible)
    utts = synth_corpus(
        n_utts, cfg.model.vocab_size, seed=seed,
        min_tokens=d.synth_min_tokens, max_tokens=d.synth_max_tokens,
        sample_rate=cfg.feature.sample_rate,
        samples_per_token=d.synth_frames_per_token * cfg.feature.hop_length,
        chord=d.synth_chord,
        hard=d.synth_hard, snr_db=d.synth_snr_db,
        jitter_mel=d.synth_jitter_mel, gain_jitter_db=d.synth_gain_jitter_db,
        markov=d.synth_markov,
    )
    if d.wire_dtype == "int16":
        # encode ONCE at corpus build (also halves corpus RAM): per-step
        # conversion on the prefetch worker thread costs ~120 ms/step
        from tpuasr.data.pipeline import wire_waves

        utts = [Utterance(u.utt_id, wire_waves(u.wave, "int16"), u.tokens,
                          u.wave_len) for u in utts]
    return make_pipeline(utts, cfg)
