"""Forced alignment (vs numpy Viterbi reference), LR schedules, SpecAugment,
CMVN tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.audio.cmvn import apply_cmvn, compute_cmvn_stats
from tpuasr.audio.specaug import spec_augment
from tpuasr.decode.alignment import ctc_forced_align, token_timestamps
from tpuasr.train.schedules import SCHEDULES, get_schedule


def _np_viterbi(lp, labels, blank):
    """Loop Viterbi over the 2U+1 lattice; returns (best score, alignment)."""
    t_max = lp.shape[0]
    u = len(labels)
    s = 2 * u + 1
    lab = [blank if i % 2 == 0 else labels[i // 2] for i in range(s)]
    delta = np.full((t_max, s), -1e30)
    psi = np.zeros((t_max, s), np.int32)
    delta[0, 0] = lp[0, blank]
    if u > 0:
        delta[0, 1] = lp[0, lab[1]]
    for t in range(1, t_max):
        for si in range(s):
            cands = [delta[t - 1, si]]
            if si >= 1:
                cands.append(delta[t - 1, si - 1])
            else:
                cands.append(-1e30)
            if si >= 2 and lab[si] != blank and lab[si] != lab[si - 2]:
                cands.append(delta[t - 1, si - 2])
            else:
                cands.append(-1e30)
            k = int(np.argmax(cands))
            psi[t, si] = k
            delta[t, si] = cands[k] + lp[t, lab[si]]
    ends = [delta[t_max - 1, 2 * u]]
    if u > 0:
        ends.append(delta[t_max - 1, 2 * u - 1])
    best_end = int(np.argmax(ends))
    score = ends[best_end]
    si = 2 * u if best_end == 0 else 2 * u - 1
    align = []
    for t in range(t_max - 1, -1, -1):
        align.append(lab[si])
        si -= psi[t, si]
    return score, align[::-1]


def test_forced_align_matches_numpy(rng):
    b, t, v, u, blank = 2, 14, 7, 4, 0
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2
    labels = rng.integers(1, v, (b, u)).astype(np.int32)
    il = np.array([t, t - 4], np.int32)
    ll = np.array([u, u - 1], np.int32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    align, scores = ctc_forced_align(jnp.asarray(lp), labels, il, ll, blank)
    align, scores = np.asarray(align), np.asarray(scores)
    for i in range(b):
        ref_score, ref_align = _np_viterbi(lp[i, : il[i]], labels[i, : ll[i]].tolist(), blank)
        np.testing.assert_allclose(scores[i], ref_score, rtol=1e-5)
        assert align[i, : il[i]].tolist() == ref_align
        # collapsing the alignment recovers the labels
        from tpuasr.decode.ctc_greedy import remove_duplicates_and_blank

        assert remove_duplicates_and_blank(align[i, : il[i]], blank) == labels[i, : ll[i]].tolist()


def test_token_timestamps():
    align = np.array([[0, 3, 3, 0, 5, 5, 0]], np.int32)
    assert token_timestamps(align, 0) == [[1, 4]]


def test_schedules_shapes_and_peaks():
    lr, w = 1e-3, 100
    for name in SCHEDULES:
        kw = {"lr": lr, "warmup_steps": w}
        if name == "noam":
            kw = {"base_lr": lr, "warmup_steps": w, "d_model": 256}
        elif name in ("warmup_hold", "noam_hold_annealing"):
            kw["hold_steps"] = 50
        elif name.endswith("annealing") and name != "noam_hold_annealing":
            kw["max_steps"] = 1000
        f = get_schedule(name, **kw)
        vals = np.array([float(f(jnp.asarray(s))) for s in [0, 10, w, 500, 999]])
        assert np.all(vals >= 0)
        assert vals[0] < vals[2] or name == "noam"  # warmup increases


def test_warmuplr_peak_at_warmup():
    f = get_schedule("warmuplr", lr=1e-3, warmup_steps=100)
    v = [float(f(jnp.asarray(s))) for s in range(0, 400, 10)]
    assert abs(np.argmax(v) * 10 - 100) <= 10


def test_spec_augment_masks(rng):
    feats = jnp.ones((2, 40, 20))
    lens = np.array([40, 30], np.int32)
    out = np.asarray(spec_augment(jax.random.PRNGKey(0), feats, lens))
    assert out.shape == (2, 40, 20)
    assert (out == 0).any()
    assert (out == 1).any()


def test_cmvn_roundtrip(rng):
    feats = rng.standard_normal((4, 50, 8)).astype(np.float32) * 3 + 5
    lens = np.full(4, 50, np.int32)
    mean, istd = compute_cmvn_stats([feats], [lens])
    normed = np.asarray(apply_cmvn(jnp.asarray(feats), mean, istd))
    np.testing.assert_allclose(normed.mean((0, 1)), 0, atol=1e-4)
    np.testing.assert_allclose(normed.std((0, 1)), 1, atol=1e-3)
