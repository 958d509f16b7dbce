"""Serving-demo endpoint gate: tools/decode_stream.py on a raw WAV must emit
exactly the reference syllables — no spurious trailing token from the
zero-padded final chunk window (VERDICT r4 weak#6; reference parity:
online_rnnt_model.py:274-344 decodes only real audio). Pinned to the
campaign checkpoint like tests/test_campaign_ckpt.py (skips where exp/ is
absent)."""

import os
import subprocess
import sys
import wave as wave_mod

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "exp", "campaign", "epoch_0049")


def _write_wav(path, wave, sr):
    pcm = np.clip(np.rint(wave * 32767.0), -32768, 32767).astype("<i2")
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.mark.slow
def test_decode_stream_no_trailing_token(tmp_path):
    if not os.path.isdir(CKPT):
        pytest.skip("campaign checkpoint not on this machine")
    from tpuasr.data.synthetic import synth_utterance

    # unseen utterance: campaign train used seed 0, dev seed 1 — seed 1234
    # with the same chord protocol (48 kHz, 24 frames/token) is held out
    rng = np.random.default_rng(1234)
    wave, tokens = synth_utterance(rng, 412, 10, sample_rate=48000,
                                   samples_per_token=24 * 512, chord=True)
    ref = [f"syl{t - 6}" for t in tokens]
    wav_path = str(tmp_path / "utt.wav")
    _write_wav(wav_path, wave, 48000)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "decode_stream.py"),
         "--checkpoint", CKPT, "--wav", wav_path],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = out.stdout.splitlines()
    # final greedy line = the last "chunk N: ..." before the beam section
    greedy = [l for l in lines if l.startswith("chunk ")][-1]
    hyp = greedy.split(":", 1)[1].split()
    assert hyp == ref, f"greedy endpoint mismatch:\nREF {ref}\nHYP {hyp}"
    # top beam candidate must match too
    cand1 = [l for l in lines if l.startswith("cand 1 ")][0]
    bhyp = cand1.split(":", 1)[1].split()
    assert bhyp == ref, f"beam endpoint mismatch:\nREF {ref}\nHYP {bhyp}"
