"""fbank golden tests.

The reference front-end is torchaudio MelSpectrogram + AmplitudeToDB
(data/dataloader.py:15-41). torchaudio is not in this environment, so the
spectrogram path is checked against core ``torch.stft`` (an independent
implementation of the same center/reflect/hamming/power-2 contract) and the
HTK mel filterbank against a scalar-loop re-derivation; Pallas(interpret) is
checked against the jnp path.
"""

import numpy as np
import pytest
import torch

from tpuasr.audio import fbank, fbank_batch, frame_signal, hamming_window, mel_filterbank
from tpuasr.config import FeatureConfig


def _ref_logmel(wave: np.ndarray, cfg: FeatureConfig, mel_fb: np.ndarray) -> np.ndarray:
    spec = torch.stft(
        torch.from_numpy(wave),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=torch.hamming_window(cfg.win_length),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    power = spec.abs().numpy().T ** 2  # [T, n_freqs]
    mel = power @ mel_fb
    return 10.0 * np.log10(np.maximum(mel, cfg.amin))


@pytest.mark.parametrize("sr,n", [(16000, 16000), (48000, 48000 + 777)])
def test_fbank_matches_torch_stft(rng, sr, n):
    cfg = FeatureConfig(sample_rate=sr, use_pallas=False)
    wave = rng.standard_normal(n).astype(np.float32) * 0.1
    mel_fb = mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, sr)
    ref = _ref_logmel(wave, cfg, mel_fb)
    got = np.asarray(fbank(wave, cfg))
    assert got.shape == ref.shape == (1 + n // cfg.hop_length, cfg.n_mels)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-2)


def test_mel_filterbank_scalar_rederivation():
    """HTK triangles recomputed with scalar loops (torchaudio melscale_fbanks
    contract: norm=None, mel_scale='htk', freqs linspace(0, sr//2, n_freqs))."""
    sr, n_freqs, n_mels = 16000, 513, 80
    got = mel_filterbank(n_freqs, n_mels, sr)

    def m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def inv(mm):
        return 700.0 * (10 ** (mm / 2595.0) - 1.0)

    pts = [inv(m(0.0) + (m(sr / 2) - m(0.0)) * i / (n_mels + 1)) for i in range(n_mels + 2)]
    freqs = [sr // 2 * i / (n_freqs - 1) for i in range(n_freqs)]
    for mi in range(0, n_mels, 13):
        lo, c, hi = pts[mi], pts[mi + 1], pts[mi + 2]
        for fi in range(0, n_freqs, 61):
            f = freqs[fi]
            if f <= lo or f >= hi:
                w = 0.0
            elif f <= c:
                w = (f - lo) / (c - lo)
            else:
                w = (hi - f) / (hi - c)
            assert abs(got[fi, mi] - w) < 1e-4, (fi, mi)


def test_hamming_window_matches_torch():
    np.testing.assert_allclose(
        hamming_window(1024), torch.hamming_window(1024).numpy(), rtol=1e-6, atol=1e-7
    )


def test_frame_signal_shapes(rng):
    x = rng.standard_normal(5000).astype(np.float32)
    f = frame_signal(x, 1024, 512, True)
    assert f.shape == (1 + 5000 // 512, 1024)


def test_pallas_interpret_matches_jnp(rng):
    n = 16000
    wave = rng.standard_normal(n).astype(np.float32) * 0.1
    jnp_out = np.asarray(fbank(wave, FeatureConfig(sample_rate=16000, use_pallas=False)))

    from tpuasr.audio.fbank import _cfg_key, _operands
    from tpuasr.ops.fbank_pallas import fbank_frames_pallas

    cfg = FeatureConfig(sample_rate=16000)
    ops = _operands(_cfg_key(cfg))
    frames = frame_signal(wave, cfg.n_fft, cfg.hop_length, cfg.center)
    pallas_out = np.asarray(
        fbank_frames_pallas(frames, ops.window, ops.cos, ops.sin, ops.mel, cfg.amin)
    )
    np.testing.assert_allclose(pallas_out, jnp_out, rtol=1e-4, atol=1e-3)


def test_fbank_batch_lengths(rng):
    cfg = FeatureConfig(sample_rate=16000, use_pallas=False)
    waves = rng.standard_normal((2, 8000)).astype(np.float32)
    waves[1, 4000:] = 0.0
    lens = np.array([8000, 4000], dtype=np.int32)
    feats, feat_lens = fbank_batch(waves, lens, cfg)
    assert feats.shape == (2, 1 + 8000 // 512, 80)
    assert list(np.asarray(feat_lens)) == [1 + 8000 // 512, 1 + 4000 // 512]
    solo = np.asarray(fbank(waves[1, :4000], cfg))
    np.testing.assert_allclose(
        np.asarray(feats[1, : solo.shape[0] - 1]), solo[:-1], rtol=1e-4, atol=1e-4
    )
