"""Hard synthetic corpus protocol (data/synthetic.py hard mode).

The quality testbed's difficulty must be *designed*, not accidental
(VERDICT r4 missing#1): these tests pin the corpus contracts — measured SNR,
mel-grid geometry, Markov language structure shared across splits, gain
jitter bounds — so a drive-by change to the generator cannot silently shift
the campaign's CER scale.
"""

import numpy as np

from tpuasr.config import Config, override
from tpuasr.data.synthetic import (
    _hz_to_mel,
    _mel_to_hz,
    hard_chord_table,
    markov_successors,
    sample_markov_tokens,
    synth_corpus,
    synth_utterance_hard,
)

V = 412  # flagship vocab (406 content + 6 specials)


def test_chord_table_geometry():
    tab = hard_chord_table(V, 48000)
    assert tab.shape == (406, 2)
    lo_hz, hi_hz = _mel_to_hz(tab[:, 0]), _mel_to_hz(tab[:, 1])
    # bands stay inside their target ranges and never overlap
    assert lo_hz.min() >= 199.0 and lo_hz.max() <= 0.19 * 48000 + 1
    assert hi_hz.min() >= 0.21 * 48000 - 1 and hi_hz.max() <= 0.47 * 48000 + 1
    # confusable sets: tokens sharing a hi band with mel-adjacent lo bands.
    # Adjacent lo spacing is uniform in mel — compute it and check the grid
    # is fine enough to confuse under the default jitter (spacing within a
    # few sigma) but not degenerate (spacing > 0)
    h = 7
    l = int(np.ceil(406 / h))
    lo_m = np.unique(tab[:, 0])
    assert len(lo_m) == l
    spacing = np.diff(np.sort(lo_m))
    assert np.allclose(spacing, spacing[0], atol=1e-6)
    assert 20.0 < spacing[0] < 120.0  # mels; default jitter sigma is 12


def test_snr_is_calibrated():
    """The injected noise matches the configured SNR, measured on the actual
    generator output: with jitter=0 the clean tone signal is fully determined
    by the returned tokens, so project it out and measure the residual."""
    tab = hard_chord_table(V, 48000)
    sr, spt = 48000, 12288
    for snr_db in (20.0, 10.0, 0.0):
        rng = np.random.default_rng(3)
        wave, tokens = synth_utterance_hard(
            rng, V, 6, sr, spt, chord_table=tab, markov_table=None,
            snr_db=snr_db, jitter_mel=0.0, gain_jitter_db=0.0)
        t = np.arange(spt) / sr
        segs = []
        for tok in tokens:
            lo, hi = _mel_to_hz(tab[tok - 6])
            segs.append(0.5 * (np.sin(2 * np.pi * lo * t) + np.sin(2 * np.pi * hi * t)))
        sig = np.concatenate(segs)
        w = wave.astype(np.float64)
        alpha = float(np.dot(w, sig) / np.dot(sig, sig))
        resid = w - alpha * sig
        meas = 10 * np.log10(alpha ** 2 * np.mean(sig ** 2) / np.mean(resid ** 2))
        assert abs(meas - snr_db) < 0.5, (snr_db, meas)


def test_markov_structure_and_split_sharing():
    tab = markov_successors(V)
    assert tab.shape == (406, 4)
    # train and dev draws use different corpus seeds but the same chain
    assert np.array_equal(tab, markov_successors(V))
    rng = np.random.default_rng(0)
    # empirical bigram preference: ~p_pref of transitions land in succ set
    hits = tot = 0
    for _ in range(200):
        toks = sample_markov_tokens(rng, V, 12, p_pref=0.8, table=tab)
        for a, b in zip(toks, toks[1:]):
            tot += 1
            hits += int((b - 6) in tab[a - 6])
    frac = hits / tot
    assert 0.72 < frac < 0.9  # 0.8 + small accidental-uniform-hit mass


def test_corpus_determinism_and_gain_bounds():
    cfg = override(Config(), {
        "data.synth_hard": True, "data.synth_snr_db": 10.0,
        "data.synth_jitter_mel": 12.0,
    })
    a = synth_corpus(8, V, seed=0, sample_rate=48000, samples_per_token=12288,
                     hard=True)
    b = synth_corpus(8, V, seed=0, sample_rate=48000, samples_per_token=12288,
                     hard=True)
    for ua, ub in zip(a, b):
        assert np.array_equal(ua.wave, ub.wave)
        assert np.array_equal(ua.tokens, ub.tokens)
    dev = synth_corpus(8, V, seed=1, sample_rate=48000,
                       samples_per_token=12288, hard=True)
    assert not np.array_equal(a[0].wave, dev[0].wave)
    for u in a:
        peak = np.max(np.abs(u.wave))
        # gain in [-9, -3] dB of full scale
        assert 10 ** (-9.2 / 20) <= peak <= 10 ** (-2.9 / 20)


def test_pipeline_wiring():
    from tpuasr.data.corpus import synthetic_pipeline

    cfg = override(Config(), {
        "data.synth_hard": True, "data.synth_snr_db": 8.0,
        "model.vocab_size": 60,
        "data.frame_buckets": (256, 512), "data.token_buckets": (16, 32),
    })
    pipe = synthetic_pipeline(cfg, 12, seed=0)
    batch = next(iter(pipe.batches(0)))
    assert batch["waves"].ndim == 2
    assert batch["texts"].max() < 60
