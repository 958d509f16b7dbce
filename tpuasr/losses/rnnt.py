"""RNN-Transducer loss — (T, U) lattice with a log-semiring associative scan.

Replaces the reference's native `torchaudio.functional.rnnt_loss`
(model/component/transducer.py:180-187, model/online_rnnt_model.py:247-255,
wenet/transducer/transducer.py:494-499) with a TPU-native design:

- the [B, T, U+1, V] joint logits reduce to two lattice inputs via one
  log-softmax + gather: blank_lp [B, T, U+1] and label_lp [B, T, U];
- alphas scan sequentially over T (unavoidable data dependence); the
  *within-step* recurrence over U — ``x_u = logaddexp(base_u, x_{u-1} +
  y_{u-1})`` — is a first-order linear recurrence in the (logaddexp, +)
  semiring and runs as `lax.associative_scan` (depth log U instead of U);
- `custom_vjp` computes exact gradients from alpha/beta occupancies in closed
  form (one extra lattice sweep, no autodiff through the scan);
- padding: for t >= t_len, blank_lp := 0 (free blank) and label_lp := -inf,
  so every path drifts through zero-cost blanks to the last row; labels
  beyond u_len get label_lp := -inf; the likelihood is read per row at
  (T-1, u_len). The masking happens before the custom_vjp boundary, which
  also blocks gradient flow into padded logits.

Tested against brute-force path enumeration and finite differences
(tests/test_rnnt_loss.py); torchaudio is not available in this environment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG = -1.0e30


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    m_safe = jnp.maximum(m, _NEG)
    return m_safe + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m_safe))


def _linrec_scan(base: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    """Solve x_u = logaddexp(base_u, x_{u-1} + gain_u) (x_{-1} = -inf) along
    the last axis. Segment composition for the associative scan:
    (A1, B1) ∘ (A2, B2) = (A1 + A2, logaddexp(B1 + A2, B2))."""

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 + a2, _logaddexp(b1 + a2, b2)

    _, x = jax.lax.associative_scan(combine, (gain, base), axis=-1)
    return x


def _linrec_scan_rev(base: jnp.ndarray, gain: jnp.ndarray) -> jnp.ndarray:
    """Solve x_u = logaddexp(base_u, x_{u+1} + gain_u) along the last axis
    (reversed recurrence; x_{U} = -inf)."""
    fb = jnp.flip(base, axis=-1)
    fg = jnp.flip(gain, axis=-1)
    x = _linrec_scan(fb, fg)
    return jnp.flip(x, axis=-1)


def rnnt_alphas(blank_lp: jnp.ndarray, label_lp: jnp.ndarray) -> jnp.ndarray:
    """alpha [B, T, U+1]: alpha[t, u] = logP(t frames consumed, u labels
    emitted). alpha[0, 0] = 0. blank transition consumes blank_lp[t, u] moving
    t -> t+1; label transition consumes label_lp[t, u] moving u -> u+1."""
    b, t, u1 = blank_lp.shape
    # gain entering x_u from x_{u-1} at frame t is label_lp[t, u-1]
    y = jnp.pad(label_lp, ((0, 0), (0, 0), (1, 0)), constant_values=_NEG)  # [B,T,U1]

    base0 = jnp.full((b, u1), _NEG).at[:, 0].set(0.0)
    alpha0 = _linrec_scan(base0, y[:, 0])

    def step(alpha_prev, inputs):
        blank_prev, y_t = inputs
        alpha_t = _linrec_scan(alpha_prev + blank_prev, y_t)
        return alpha_t, alpha_t

    xs = (jnp.swapaxes(blank_lp, 0, 1)[:-1], jnp.swapaxes(y, 0, 1)[1:])
    _, rest = jax.lax.scan(step, alpha0, xs)
    return jnp.concatenate([alpha0[None], rest], axis=0).swapaxes(0, 1)


def rnnt_betas(
    blank_lp: jnp.ndarray, label_lp: jnp.ndarray, u_lens: jnp.ndarray
) -> jnp.ndarray:
    """beta [B, T, U+1]: beta[t, u] = logP(finishing from (t, u)), including
    the terminal blank taken at (T-1, u_len). beta[0, 0] = log-likelihood."""
    b, t, u1 = blank_lp.shape
    # beta[t, u] = logaddexp(blank_lp[t, u] + beta[t+1, u],
    #                        label_lp[t, u] + beta[t, u+1])
    # with the terminal condition beta_after_corner = 0 at (T-1, u_len).
    y = jnp.pad(label_lp, ((0, 0), (0, 0), (0, 1)), constant_values=_NEG)  # gain at u

    u_idx = jnp.arange(u1)[None, :]
    terminal = (u_idx == u_lens[:, None]).astype(blank_lp.dtype)
    base_last = jnp.where(terminal > 0, blank_lp[:, t - 1], _NEG)
    beta_last = _linrec_scan_rev(base_last, y[:, t - 1])

    def step(beta_next, inputs):
        blank_t, y_t = inputs
        beta_t = _linrec_scan_rev(blank_t + beta_next, y_t)
        return beta_t, beta_t

    xs = (jnp.swapaxes(blank_lp, 0, 1)[:-1], jnp.swapaxes(y, 0, 1)[:-1])
    _, rest = jax.lax.scan(step, beta_last, xs, reverse=True)
    return jnp.concatenate([rest, beta_last[None]], axis=0).swapaxes(0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _rnnt_lattice(blank_lp, label_lp, u_lens):
    """-> [B] log-likelihood, read at (T-1, u_len) (free-blank padded rows)."""
    alpha = rnnt_alphas(blank_lp, label_lp)
    corner = jnp.take_along_axis(alpha[:, -1, :], u_lens[:, None], axis=1)[:, 0]
    last_blank = jnp.take_along_axis(blank_lp[:, -1, :], u_lens[:, None], axis=1)[:, 0]
    return corner + last_blank


def _rnnt_lattice_fwd(blank_lp, label_lp, u_lens):
    alpha = rnnt_alphas(blank_lp, label_lp)
    corner = jnp.take_along_axis(alpha[:, -1, :], u_lens[:, None], axis=1)[:, 0]
    last_blank = jnp.take_along_axis(blank_lp[:, -1, :], u_lens[:, None], axis=1)[:, 0]
    ll = corner + last_blank
    return ll, (blank_lp, label_lp, u_lens, alpha, ll)


def _rnnt_lattice_bwd(res, g):
    blank_lp, label_lp, u_lens, alpha, ll = res
    b, t, u1 = blank_lp.shape
    beta = rnnt_betas(blank_lp, label_lp, u_lens)
    # blank occupancy: transition (t, u) -> (t+1, u); the terminal blank at
    # (T-1, u_len) has beta_next = 0.
    u_idx = jnp.arange(u1)[None, None, :]
    beta_tp1 = jnp.concatenate([beta[:, 1:], jnp.full((b, 1, u1), _NEG)], axis=1)
    term = (u_idx == u_lens[:, None, None]) & (
        jnp.arange(t)[None, :, None] == t - 1
    )
    beta_tp1 = jnp.where(term, 0.0, beta_tp1)
    occ_blank = jnp.exp(
        jnp.minimum(alpha + blank_lp + beta_tp1 - ll[:, None, None], 0.0)
    )
    occ_label = jnp.exp(
        jnp.minimum(
            alpha[:, :, :-1] + label_lp + beta[:, :, 1:] - ll[:, None, None], 0.0
        )
    )
    g3 = g[:, None, None]
    return g3 * occ_blank, g3 * occ_label, None


_rnnt_lattice.defvjp(_rnnt_lattice_fwd, _rnnt_lattice_bwd)


@functools.partial(jax.jit, static_argnames=("blank",))
def rnnt_loss(
    log_probs: jnp.ndarray,  # [B, T, U+1, V] log-softmaxed joint outputs
    labels: jnp.ndarray,  # [B, U] padded label ids
    t_lens: jnp.ndarray,  # [B]
    u_lens: jnp.ndarray,  # [B]
    blank: int,
) -> jnp.ndarray:
    """Per-utterance negative log-likelihood [B]."""
    b, t, u1, v = log_probs.shape
    u = u1 - 1
    blank_lp = log_probs[..., blank]
    label_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :], labels[:, None, :, None].astype(jnp.int32), axis=3
    )[..., 0]

    t_idx = jnp.arange(t)[None, :, None]
    pad_t = t_idx >= t_lens[:, None, None]
    blank_lp = jnp.where(pad_t, 0.0, blank_lp)
    u_idx = jnp.arange(u)[None, None, :]
    label_valid = (u_idx < u_lens[:, None, None]) & ~pad_t
    label_lp = jnp.where(label_valid, label_lp, _NEG)

    ll = _rnnt_lattice(blank_lp, label_lp, u_lens)
    # zero-infinity guard (CTC parity): infeasible rows (e.g. t_len == 0 after
    # aggressive subsampling of a very short utterance) give loss 0, grad 0.
    feasible = ll > _NEG / 2
    nll = -ll
    return jnp.where(feasible, nll, jax.lax.stop_gradient(nll) * 0.0)


@functools.partial(jax.jit, static_argnames=("blank", "reduction", "use_pallas"))
def rnnt_loss_from_logits(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    t_lens: jnp.ndarray,
    u_lens: jnp.ndarray,
    blank: int,
    reduction: str = "mean",
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """torchaudio-parity entry: raw joint logits in, reduced loss out. On TPU
    the lattice runs as the fused Pallas alphas/betas kernel
    (tpuasr.ops.rnnt_pallas) by default."""
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from tpuasr.ops.rnnt_pallas import rnnt_loss_pallas

        nll = rnnt_loss_pallas(lp, labels, t_lens, u_lens, blank,
                               interpret=jax.default_backend() != "tpu")
    else:
        nll = rnnt_loss(lp, labels, t_lens, u_lens, blank)
    if reduction == "none":
        return nll
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "sum":
        return jnp.sum(nll)
    raise ValueError(reduction)
