"""Log-mel fbank feature extraction.

Numerically matches the reference front-end (data/dataloader.py:15-41 —
torchaudio MelSpectrogram with n_fft=1024, hop=512, 80 mels, periodic hamming
window, power=2, center reflect padding, HTK mel scale, no filterbank norm —
followed by AmplitudeToDB over power, i.e. ``10*log10(max(x, 1e-10))``).

Two device paths, same math:

- `fbank` / `fbank_batch` — pure jnp, with the DFT expressed as two matmuls so
  XLA tiles it onto the MXU (an rFFT of length 1024 per 10ms frame is tiny;
  a [T, n_fft] x [n_fft, n_freq] matmul is the TPU-shaped formulation);
- `tpuasr.ops.fbank_pallas.fbank_frames_pallas` — a fused Pallas kernel
  (window + DFT + power + mel + log in one VMEM-resident pass) selected via
  ``FeatureConfig.use_pallas`` on TPU backends.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.config import FeatureConfig


def hamming_window(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic hamming window (torch.hamming_window default)."""
    k = np.arange(n, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * k / n)
    return w.astype(dtype)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """[n_freqs, n_mels] triangular HTK-mel filterbank, no normalization."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel_htk(f_min), hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(dtype)


def dft_matrices(n_fft: int, dtype=np.float32) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis as two [n_fft, n_fft//2+1] matmul operands."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    return np.cos(ang).astype(dtype), (-np.sin(ang)).astype(dtype)


def num_frames(n_samples: int, cfg: FeatureConfig) -> int:
    if cfg.center:
        return 1 + n_samples // cfg.hop_length
    return 1 + (n_samples - cfg.n_fft) // cfg.hop_length


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "center"))
def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int, center: bool) -> jnp.ndarray:
    """[..., N] waveform -> [..., T, n_fft] frames (reflect-padded if center).

    When hop divides n_fft (the corpus protocol: 1024/512), frames are
    assembled from `n_fft // hop` strided block views — reshape + slice +
    concat, no gather. The general case falls back to an index gather
    (TPU-slow: ~20x the framing cost at these shapes)."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n = x.shape[-1]
    t = 1 + (n - n_fft) // hop_length
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        nb = t - 1 + r
        lead = x.shape[:-1]
        blocks = x[..., : nb * hop_length].reshape(*lead, nb, hop_length)
        parts = [blocks[..., i : i + t, :] for i in range(r)]
        return jnp.concatenate(parts, axis=-1)
    starts = jnp.arange(t) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return jnp.take(x, idx, axis=-1)


class _FbankOperands:
    """Host-side constant operands (window, DFT basis, mel filterbank)."""

    def __init__(self, cfg: FeatureConfig):
        assert cfg.win_length == cfg.n_fft, "win_length != n_fft not yet supported"
        assert cfg.window == "hamming"
        self.window = hamming_window(cfg.n_fft)
        self.cos, self.sin = dft_matrices(cfg.n_fft)
        self.mel = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)


@functools.lru_cache(maxsize=8)
def _operands(key: tuple) -> _FbankOperands:
    return _FbankOperands(FeatureConfig(**dict(key)))


def _cfg_key(cfg: FeatureConfig) -> tuple:
    from dataclasses import asdict

    return tuple(sorted(asdict(cfg).items()))


@functools.partial(jax.jit, static_argnames=("power", "amin"))
def _frames_to_logmel(frames, window, cos, sin, mel, power: float, amin: float):
    # HIGHEST precision: the DFT needs true f32 accumulation — bf16-MXU default
    # precision visibly distorts low-energy bins after the log.
    hi = jax.lax.Precision.HIGHEST
    fw = frames * window  # [T, n_fft]
    re = jnp.dot(fw, cos, preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(fw, sin, preferred_element_type=jnp.float32, precision=hi)
    spec = re * re + im * im  # power 2.0
    if power != 2.0:
        spec = jnp.power(jnp.sqrt(spec), power)
    m = jnp.dot(spec, mel, preferred_element_type=jnp.float32, precision=hi)
    return 10.0 * jnp.log10(jnp.maximum(m, amin))


def _decode_wire(waves: jnp.ndarray) -> jnp.ndarray:
    """Undo the int16 wire format (tpuasr.data.prefetch.wire_waves): waves
    may arrive as int16 PCM to halve host->device transfer bytes."""
    if waves.dtype == jnp.int16:
        return waves.astype(jnp.float32) * (1.0 / 32768.0)
    return waves


def fbank(waveform: jnp.ndarray, cfg: FeatureConfig) -> jnp.ndarray:
    """[N] float (or int16 PCM) waveform -> [T, n_mels] log-mel features."""
    waveform = _decode_wire(waveform)
    ops = _operands(_cfg_key(cfg))
    frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length, cfg.center)
    if cfg.use_pallas and jax.default_backend() == "tpu":
        from tpuasr.ops.fbank_pallas import fbank_frames_pallas

        return fbank_frames_pallas(frames, ops.window, ops.cos, ops.sin, ops.mel,
                                   cfg.amin,
                                   getattr(cfg, "fbank_precision", "highest"))
    return _frames_to_logmel(
        frames, ops.window, ops.cos, ops.sin, ops.mel, cfg.power, cfg.amin
    )


def fbank_batch(
    waves: jnp.ndarray, wave_lens: jnp.ndarray, cfg: FeatureConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, N] padded waveforms -> ([B, T, n_mels], feat_lens [B]).

    Padded samples produce garbage trailing frames; feat_lens marks the valid
    prefix (1 + len // hop, the torchaudio center=True frame count).
    """
    feats = jax.vmap(lambda w: fbank(w, cfg))(_decode_wire(waves))
    feat_lens = 1 + wave_lens // cfg.hop_length
    return feats, feat_lens
