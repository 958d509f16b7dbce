"""Native runtime library tests: builds native/ (once), then checks WAV
decode parity with the python reader, the parallel batch loader, and the C++
CER counts against the python DP."""

import os
import subprocess
import wave

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def native():
    build = os.path.join(ROOT, "native", "build.sh")
    try:
        subprocess.run(["sh", build], check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        pytest.skip(f"native build failed: {e}")
    from tpuasr.utils import native as nat

    if not nat.is_available():
        pytest.skip("native library not found after build")
    return nat


def _write_wav(path, data_f32, sr=16000, width=2):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(sr)
        if width == 2:
            w.writeframes((data_f32 * 32767).astype("<i2").tobytes())
        else:
            raise ValueError(width)


def test_wav_read_matches_python(native, tmp_path, rng):
    data = (rng.standard_normal(8000) * 0.3).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "a.wav")
    _write_wav(path, data, sr=22050)
    wave_n, sr = native.wav_read(path)
    from tpuasr.data.bznsyp import read_wav

    wave_p, sr_p = read_wav(path)
    assert sr == sr_p == 22050
    np.testing.assert_allclose(wave_n, wave_p, atol=1e-4)


def test_batch_loader(native, tmp_path, rng):
    paths = []
    refs = []
    for i in range(6):
        n = 4000 + 517 * i
        data = (rng.standard_normal(n) * 0.2).clip(-1, 1).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        _write_wav(p, data)
        paths.append(p)
        refs.append(data)
    loader = native.BatchLoader(num_threads=3)
    waves, lens = loader.load(paths, max_samples=8000)
    assert waves.shape == (6, 8000)
    for i, r in enumerate(refs):
        assert lens[i] == min(len(r), 8000)
        np.testing.assert_allclose(waves[i, : lens[i]], r[: lens[i]], atol=1e-4)
        assert np.all(waves[i, lens[i]:] == 0)


def test_cer_counts_matches_python(native, rng):
    from tpuasr.text.cer import cer_details

    for _ in range(20):
        ref = rng.integers(0, 6, rng.integers(0, 12)).tolist()
        hyp = rng.integers(0, 6, rng.integers(0, 12)).tolist()
        s, d, i = native.cer_counts_native(ref, hyp)
        py = cer_details(ref, hyp)
        assert s + d + i == py.errors
