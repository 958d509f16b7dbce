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


def _host_prefix_beam_times(lp, blank, beam):
    """Independent host implementation of the viterbi-times variant: each
    prefix carries (pb, pnb) plus viterbi (v_s, times_s), (v_ns, times_ns)
    and the running peak prob of the last token."""
    NEG = -1e30

    def logadd(a, b):
        if a < -1e29:
            return b
        if b < -1e29:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    hyps = {(): dict(pb=0.0, pnb=NEG, v_s=0.0, v_ns=0.0, ts=(), tns=(), cur=NEG)}
    t_max, v = lp.shape
    for t in range(t_max):
        top = [int(u) for u in np.argsort(lp[t])[::-1] if u != blank][:beam]
        nxt = {}

        def get(p):
            if p not in nxt:
                nxt[p] = dict(pb=NEG, pnb=NEG, v_s=NEG, v_ns=NEG,
                              ts=(), tns=(), cur=NEG)
            return nxt[p]

        for p, s in hyps.items():
            total = logadd(s["pb"], s["pnb"])
            vbest = max(s["v_s"], s["v_ns"])
            tbest = s["ts"] if s["v_s"] > s["v_ns"] else s["tns"]
            # blank: stay
            ns = get(p)
            ns["pb"] = logadd(ns["pb"], total + lp[t, blank])
            if vbest + lp[t, blank] > ns["v_s"]:
                ns["v_s"] = vbest + lp[t, blank]
                ns["ts"] = tbest
            # repeat of the last char: stay on the non-blank path
            if p:
                prob = lp[t, p[-1]]
                ns = get(p)
                ns["pnb"] = logadd(ns["pnb"], s["pnb"] + prob)
                if s["v_ns"] + prob > ns["v_ns"]:
                    ns["v_ns"] = s["v_ns"] + prob
                    if prob > s["cur"]:
                        ns["tns"] = s["tns"][:-1] + (t,)
                        ns["cur"] = prob
                    else:
                        ns["tns"], ns["cur"] = s["tns"], s["cur"]
            for u in top:
                prob = lp[t, u]
                ns = get(p + (u,))
                if p and u == p[-1]:
                    ns["pnb"] = logadd(ns["pnb"], s["pb"] + prob)
                    if s["v_s"] + prob > ns["v_ns"]:
                        ns["v_ns"] = s["v_s"] + prob
                        ns["tns"] = s["ts"] + (t,)
                        ns["cur"] = prob
                else:
                    ns["pnb"] = logadd(ns["pnb"], total + prob)
                    if vbest + prob > ns["v_ns"]:
                        ns["v_ns"] = vbest + prob
                        ns["tns"] = tbest + (t,)
                        ns["cur"] = prob
        hyps = dict(
            sorted(nxt.items(), key=lambda kv: -logadd(kv[1]["pb"], kv[1]["pnb"]))[:beam]
        )
    out = []
    for p, s in sorted(
        hyps.items(), key=lambda kv: -logadd(kv[1]["pb"], kv[1]["pnb"])
    ):
        times = s["ts"] if s["v_s"] > s["v_ns"] else s["tns"]
        out.append((p, logadd(s["pb"], s["pnb"]), times))
    return out


def test_prefix_beam_viterbi_times_match_host(rng):
    b, t, v, blank, beam = 2, 14, 8, 0, 4
    logits = rng.standard_normal((b, t, v)).astype(np.float32) * 2
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    lens = np.array([t, t - 4], np.int32)

    best_tok, best_len, best_times, _ = ctc_prefix_beam_search(
        jnp.asarray(lp), lens, blank, beam_size=beam, max_tokens=16,
        return_times=True,
    )
    for i in range(b):
        ref = _host_prefix_beam_times(lp[i, : lens[i]], blank, beam)
        got = tuple(np.asarray(best_tok[i, : int(best_len[i])]))
        assert got == ref[0][0], (got, ref[0][0])
        got_times = tuple(np.asarray(best_times[i, : int(best_len[i])]))
        assert got_times == ref[0][2], (got_times, ref[0][2])


def test_prefix_beam_times_peaked_inputs():
    """On near-one-hot inputs the viterbi times are the emission frames."""
    b, t, v, blank = 1, 10, 12, 0
    path = [0, 3, 3, 0, 4, 0, 0, 3, 5, 0]
    lp = np.full((b, t, v), -20.0, np.float32)
    for i, p in enumerate(path):
        lp[0, i, p] = 0.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(lp), axis=-1))
    tok, ln, times, _ = ctc_prefix_beam_search(
        jnp.asarray(lp), np.array([t], np.int32), blank, 4, 16, return_times=True
    )
    assert list(np.asarray(tok[0, : int(ln[0])])) == [3, 4, 3, 5]
    # token 3's run spans frames 1-2 with equal peak prob -> first frame 1
    assert list(np.asarray(times[0, : int(ln[0])])) == [1, 4, 7, 8]


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
