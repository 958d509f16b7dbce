"""RNN-T loss tests: brute-force path enumeration (independent of the lattice
code), a plain-loop numpy DP, finite-difference gradients, and padding
invariance. (torchaudio's rnnt_loss is not available in this environment; the
brute-force enumeration is the independent golden.)"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.losses import rnnt_loss, rnnt_loss_from_logits


def _brute_force_nll(lp, labels, blank):
    """Enumerate all monotone (T, U) paths. lp: [T, U+1, V]; labels: [U]."""
    t_max, u1, v = lp.shape
    u_max = len(labels)
    total = -np.inf

    def logadd(a, b):
        if a == -np.inf:
            return b
        if b == -np.inf:
            return a
        m = max(a, b)
        return m + np.log(np.exp(a - m) + np.exp(b - m))

    # a path = interleaving of t_max blanks and u_max labels; the last move
    # must be the terminal blank at (t_max-1, u_max).
    n_moves = t_max + u_max
    for blank_positions in itertools.combinations(range(n_moves), t_max):
        if (n_moves - 1) not in blank_positions:
            continue  # must end with the final blank
        t = u = 0
        score = 0.0
        ok = True
        for m in range(n_moves):
            if m in blank_positions:
                if t >= t_max:
                    ok = False
                    break
                score += lp[t, u, blank]
                t += 1
            else:
                if u >= u_max or t >= t_max:
                    ok = False
                    break
                score += lp[t, u, labels[u]]
                u += 1
        if ok and t == t_max and u == u_max:
            total = logadd(total, score)
    return -total


def _loop_dp_nll(lp, labels, blank):
    """Plain-loop alpha DP (independent of the scan formulation)."""
    t_max, u1, _ = lp.shape
    u_max = len(labels)
    alpha = np.full((t_max, u_max + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_max):
        for u in range(u_max + 1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, labels[u - 1]])
            if cands:
                m = max(cands)
                if m > -np.inf:
                    alpha[t, u] = m + np.log(sum(np.exp(c - m) for c in cands))
    return -(alpha[t_max - 1, u_max] + lp[t_max - 1, u_max, blank])


def _rand_logits(rng, b, t, u1, v):
    return rng.standard_normal((b, t, u1, v)).astype(np.float32)


def test_rnnt_matches_brute_force(rng):
    b, t, u, v, blank = 2, 4, 2, 5, 0
    logits = _rand_logits(rng, b, t, u + 1, v)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    got = np.asarray(
        rnnt_loss(jnp.asarray(lp), labels, np.full(b, t, np.int32), np.full(b, u, np.int32), blank)
    )
    for i in range(b):
        ref = _brute_force_nll(lp[i], labels[i], blank)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-4)


def test_rnnt_matches_loop_dp_larger(rng):
    b, t, u, v, blank = 3, 11, 6, 8, 2
    logits = _rand_logits(rng, b, t, u + 1, v)
    labels = rng.integers(3, v, size=(b, u)).astype(np.int32)
    t_lens = np.array([t, t - 4, t - 2], np.int32)
    u_lens = np.array([u, u - 3, u - 1], np.int32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    got = np.asarray(rnnt_loss(jnp.asarray(lp), labels, t_lens, u_lens, blank))
    for i in range(b):
        ref = _loop_dp_nll(lp[i, : t_lens[i]], labels[i, : u_lens[i]], blank)
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-4)


def test_rnnt_padding_invariance(rng):
    """Loss must not change when T/U padding grows."""
    b, t, u, v, blank = 2, 6, 3, 5, 0
    logits = _rand_logits(rng, b, t, u + 1, v)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    t_lens = np.array([t, t - 2], np.int32)
    u_lens = np.array([u, u - 1], np.int32)
    base = np.asarray(rnnt_loss_from_logits(
        jnp.asarray(logits), labels, t_lens, u_lens, blank, "none"))

    big = rng.standard_normal((b, t + 3, u + 3, v)).astype(np.float32) * 5
    big[:, :t, : u + 1, :] = logits
    labels_big = np.concatenate([labels, np.zeros((b, 2), np.int32)], axis=1)
    padded = np.asarray(rnnt_loss_from_logits(
        jnp.asarray(big), labels_big, t_lens, u_lens, blank, "none"))
    np.testing.assert_allclose(padded, base, rtol=1e-4, atol=1e-4)


def test_rnnt_grad_finite_difference(rng):
    b, t, u, v, blank = 1, 3, 2, 4, 0
    logits = _rand_logits(rng, b, t, u + 1, v)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    t_lens, u_lens = np.array([t], np.int32), np.array([u], np.int32)

    def f(x):
        return rnnt_loss_from_logits(x, labels, t_lens, u_lens, blank, "sum")

    x0 = jnp.asarray(logits)
    g = np.asarray(jax.grad(f)(x0))
    eps = 1e-3
    for idx in [(0, 0, 0, 1), (0, 1, 1, 0), (0, 2, 2, 3), (0, 1, 0, 2)]:
        d = np.zeros_like(logits)
        d[idx] = eps
        fd = (float(f(x0 + d)) - float(f(x0 - d))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-4)


def test_rnnt_grad_padded_regions_zero(rng):
    b, t, u, v, blank = 1, 5, 3, 4, 0
    logits = _rand_logits(rng, b, t, u + 1, v)
    labels = rng.integers(1, v, size=(b, u)).astype(np.int32)
    t_lens, u_lens = np.array([3], np.int32), np.array([2], np.int32)

    g = np.asarray(
        jax.grad(lambda x: rnnt_loss_from_logits(x, labels, t_lens, u_lens, blank, "sum"))(
            jnp.asarray(logits)
        )
    )
    np.testing.assert_allclose(g[:, 3:], 0.0, atol=1e-6)  # padded frames
    np.testing.assert_allclose(g[:, :, 3:], 0.0, atol=1e-6)  # padded labels (col > u_len)


def test_rnnt_perfect_prediction_low_loss():
    """A model that puts all mass on the right token each step -> tiny loss."""
    t, u, v, blank = 4, 2, 5, 0
    labels = np.array([[2, 3]], np.int32)
    logits = np.full((1, t, u + 1, v), -20.0, np.float32)
    # emit label u at (t=u, u), blanks elsewhere along the diagonal path
    logits[0, 0, 0, 2] = 20.0
    logits[0, 0, 1, 3] = 20.0
    for tt in range(t):
        for uu in range(u + 1):
            if not (tt == 0 and uu < u):
                logits[0, tt, uu, blank] = 20.0
    loss = float(
        rnnt_loss_from_logits(jnp.asarray(logits), labels,
                              np.array([t], np.int32), np.array([u], np.int32), blank, "sum")
    )
    assert loss < 0.01
