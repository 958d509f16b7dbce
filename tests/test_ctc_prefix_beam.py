"""CTC prefix beam search: vs an independent dict-based host implementation of
the same algebra (the wenet formulation, search.py:125-247), plus a peaked
case that must reduce to greedy collapse."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.decode import ctc_greedy_decode
from tpuasr.decode.ctc_prefix_beam import ctc_prefix_beam_search


def _host_prefix_beam(lp, blank, beam):
    """Reference: dict prefixes with (pb, pnb), top-`beam` token expansion."""

    def logadd(*xs):
        xs = [x for x in xs if x > -1e29]
        if not xs:
            return -1e30
        m = max(xs)
        return m + math.log(sum(math.exp(x - m) for x in xs))

    prefixes = {(): (0.0, -1e30)}  # prefix -> (pb, pnb)
    t_max, v = lp.shape
    for t in range(t_max):
        top = np.argsort(lp[t])[::-1]
        top = [u for u in top if u != blank][:beam]
        nxt = {}

        def add(p, pb, pnb):
            opb, opnb = nxt.get(p, (-1e30, -1e30))
            nxt[p] = (logadd(opb, pb), logadd(opnb, pnb))

        for p, (pb, pnb) in prefixes.items():
            total = logadd(pb, pnb)
            # blank
            add(p, total + lp[t, blank], -1e30)
            # repeat of last char
            if p:
                add(p, -1e30, pnb + lp[t, p[-1]])
            for u in top:
                u = int(u)
                if p and u == p[-1]:
                    add(p + (u,), -1e30, pb + lp[t, u])
                else:
                    add(p + (u,), -1e30, total + lp[t, u])
        prefixes = dict(
            sorted(nxt.items(), key=lambda kv: -logadd(*kv[1]))[:beam]
        )
    return sorted(
        ((p, logadd(*s)) for p, s in prefixes.items()), key=lambda kv: -kv[1]
    )


def test_prefix_beam_matches_host_reference(rng):
    b, t, v, blank, beam = 2, 12, 8, 0, 4
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    lens = np.array([t, t - 3], np.int32)

    best_tok, best_len, (nb_tok, nb_len, nb_score) = ctc_prefix_beam_search(
        jnp.asarray(lp), lens, blank, beam_size=beam, max_tokens=16
    )
    for i in range(b):
        ref = _host_prefix_beam(lp[i, : lens[i]], blank, beam)
        got_best = tuple(np.asarray(best_tok[i, : int(best_len[i])]))
        assert got_best == ref[0][0], (got_best, ref[0][0])
        np.testing.assert_allclose(
            float(np.max(np.asarray(nb_score[i]))), ref[0][1], rtol=1e-4, atol=1e-4
        )


def test_prefix_beam_peaked_equals_greedy(rng):
    b, t, v, blank = 1, 10, 12, 0
    path = [3, 3, 0, 4, 4, 0, 3, 5, 5, 0]
    lp = np.full((b, t, v), -20.0, np.float32)
    for i, p in enumerate(path):
        lp[0, i, p] = 0.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), axis=-1))
    lens = np.array([t], np.int32)
    g_tok, g_len = ctc_greedy_decode(jnp.asarray(lp), lens, blank)
    b_tok, b_len, _ = ctc_prefix_beam_search(jnp.asarray(lp), lens, blank, 4, 16)
    assert list(np.asarray(g_tok[0, : int(g_len[0])])) == list(
        np.asarray(b_tok[0, : int(b_len[0])])
    )
