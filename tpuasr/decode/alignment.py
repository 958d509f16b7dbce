"""CTC forced alignment (Viterbi over the blank-interleaved lattice).

Parity: torchaudio.functional.forced_align as used by
wenet/utils/ctc_utils.py:106-119 (`force_align`), plus the token-timestamp
utilities (ctc_utils.py:51-93). Batched and jit-compiled: the Viterbi deltas
and backpointers run as one lax.scan over time; the backtrace as a reverse
scan — no per-utterance python loops."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpuasr.losses.ctc import lattice_labels

_NEG = -1.0e30


@functools.partial(jax.jit, static_argnames=("blank",))
def ctc_forced_align(
    log_probs: jnp.ndarray,  # [B, T, V]
    labels: jnp.ndarray,  # [B, U]
    input_lens: jnp.ndarray,  # [B]
    label_lens: jnp.ndarray,  # [B]
    blank: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (alignment [B, T] of token ids per frame (blank included),
           scores [B] viterbi log-prob). Frames >= input_len hold blank."""
    b, t, _ = log_probs.shape
    u = labels.shape[1]
    s = 2 * u + 1

    lab = lattice_labels(labels, blank)
    state_idx = jnp.arange(s)[None, :]
    state_valid = state_idx <= 2 * label_lens[:, None]
    lp_states = jnp.take_along_axis(log_probs, lab[:, None, :].astype(jnp.int32), axis=2)
    lp_states = jnp.where(state_valid[:, None, :], lp_states, _NEG)

    lab_m2 = jnp.pad(lab, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    can_skip = (lab != blank) & (lab != lab_m2) & (state_idx >= 2)

    delta0 = jnp.full((b, s), _NEG)
    delta0 = delta0.at[:, 0].set(lp_states[:, 0, 0])
    delta0 = delta0.at[:, 1].set(jnp.where(label_lens > 0, lp_states[:, 0, 1], _NEG))

    def step(delta, inputs):
        lp_t, t_idx = inputs
        d1 = jnp.pad(delta, ((0, 0), (1, 0)), constant_values=_NEG)[:, :s]
        d2 = jnp.where(can_skip, jnp.pad(delta, ((0, 0), (2, 0)), constant_values=_NEG)[:, :s], _NEG)
        stacked = jnp.stack([delta, d1, d2], axis=-1)  # [B, S, 3]
        choice = jnp.argmax(stacked, axis=-1)  # 0: stay, 1: s-1, 2: s-2
        new = jnp.max(stacked, axis=-1) + lp_t
        active = (t_idx < input_lens)[:, None]
        delta = jnp.where(active, new, delta)
        choice = jnp.where(active, choice, 0)
        return delta, choice

    xs = (jnp.swapaxes(lp_states, 0, 1)[1:], jnp.arange(1, t))
    delta, psi = jax.lax.scan(step, delta0, xs)  # psi [T-1, B, S]
    psi = jnp.concatenate([jnp.zeros((1, b, s), psi.dtype), psi], axis=0)  # [T, B, S]

    ul = label_lens
    last_blank = jnp.take_along_axis(delta, (2 * ul)[:, None], axis=1)[:, 0]
    last_label = jnp.where(
        ul > 0,
        jnp.take_along_axis(delta, jnp.maximum(2 * ul - 1, 0)[:, None], axis=1)[:, 0],
        _NEG,
    )
    final_state = jnp.where(last_blank >= last_label, 2 * ul, jnp.maximum(2 * ul - 1, 0))
    scores = jnp.maximum(last_blank, last_label)

    # backtrace from t = input_len - 1 downward
    def back(carry, inputs):
        s_cur = carry
        psi_t, t_idx = inputs  # [B, S], scalar
        is_last = t_idx == input_lens - 1
        s_cur = jnp.where(is_last, final_state, s_cur)
        state_out = jnp.where(t_idx < input_lens, s_cur, 0)
        step_back = jnp.take_along_axis(psi_t, s_cur[:, None], axis=1)[:, 0]
        s_prev = jnp.where(t_idx > 0, s_cur - step_back, s_cur)
        return s_prev, state_out

    _, states_rev = jax.lax.scan(
        back, jnp.zeros((b,), jnp.int32),
        (jnp.flip(psi, 0).astype(jnp.int32), jnp.arange(t - 1, -1, -1)),
    )
    states = jnp.flip(states_rev, 0).swapaxes(0, 1)  # [B, T]
    align = jnp.take_along_axis(lab, states, axis=1)
    valid = jnp.arange(t)[None, :] < input_lens[:, None]
    align = jnp.where(valid, align, blank)
    return align, scores


def token_timestamps(alignment, blank: int):
    """Host-side: first frame index of each emitted token
    (wenet ctc_utils.py:51-93 role)."""
    import numpy as np

    alignment = np.asarray(alignment)
    out = []
    for row in alignment:
        times = []
        prev = blank
        for t, a in enumerate(row):
            if a != blank and a != prev:
                times.append(t)
            prev = a
        out.append(times)
    return out


def replace_duplicates_with_blank(hyp, blank_id: int = 0):
    """Separate repeated tokens with a blank so a frame alignment stays
    CTC-decodable (wenet ctc_utils.py:36-49)."""
    out = []
    cur = 0
    n = len(hyp)
    while cur < n:
        out.append(int(hyp[cur]))
        prev = cur
        cur += 1
        while cur < n and hyp[cur] == hyp[prev] and hyp[cur] != blank_id:
            out.append(blank_id)
            cur += 1
    return out


def gen_ctc_peak_time(hyp, blank_id: int = 0):
    """Frame index of each run's first frame, blanks skipped
    (wenet ctc_utils.py:51-61)."""
    times = []
    cur = 0
    n = len(hyp)
    while cur < n:
        if hyp[cur] != blank_id:
            times.append(cur)
        prev = cur
        while cur < n and hyp[cur] == hyp[prev]:
            cur += 1
    return times


def gen_timestamps_from_peak(
    peaks,
    max_duration: float,
    frame_rate: float = 0.04,
    max_token_duration: float = 1.0,
):
    """(start, end) seconds per token from CTC peak frames: boundaries at the
    midpoint between neighbouring peaks, clamped to max_token_duration/2 on
    each side (wenet ctc_utils.py:63-93)."""
    times = []
    half = max_token_duration / 2
    n = len(peaks)
    for i in range(n):
        if i == 0:
            start = max(0.0, peaks[0] * frame_rate - half)
        else:
            start = max((peaks[i - 1] + peaks[i]) / 2 * frame_rate,
                        peaks[i] * frame_rate - half)
        if i == n - 1:
            end = min(max_duration, peaks[-1] * frame_rate + half)
        else:
            end = min((peaks[i] + peaks[i + 1]) / 2 * frame_rate,
                      peaks[i] * frame_rate + half)
        times.append((start, end))
    return times
