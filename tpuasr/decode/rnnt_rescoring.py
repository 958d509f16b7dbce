"""Transducer rescoring of CTC prefix-beam n-best.

Parity: wenet/transducer/transducer.py:215-395 (beam_search +
transducer-rescoring decode modes: CTC proposes prefixes, the transducer
scores them; final score fuses transducer NLL with the CTC beam score).

Batched: the n-best flatten to B*N rows and one `rnnt_loss` lattice pass
scores them all (the reference loops per hypothesis)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuasr.losses import rnnt_loss_from_logits
from tpuasr.models.transducer import add_blank

_NEG = -1.0e30


def transducer_rescoring(
    model,  # Transducer (unbound)
    params,
    enc_out: jnp.ndarray,  # [B, T, D]
    enc_lens: jnp.ndarray,  # [B]
    nbest_tokens: jnp.ndarray,  # [B, N, U]
    nbest_lens: jnp.ndarray,  # [B, N]
    nbest_scores: jnp.ndarray,  # [B, N] (CTC beam log scores)
    blank_id: int,
    transducer_weight: float = 0.7,
    ctc_weight: float = 0.3,
):
    """-> (tokens [B, U], lens [B], fused scores [B, N])."""
    b, n, u = nbest_tokens.shape
    flat_tok = nbest_tokens.reshape(b * n, u)
    flat_len = nbest_lens.reshape(b * n)
    enc_rep = jnp.repeat(enc_out, n, axis=0)
    lens_rep = jnp.repeat(enc_lens, n, axis=0)

    ys_in = add_blank(flat_tok, blank_id)
    pred = model.apply(params, ys_in, method="predict")
    logits = model.apply(params, enc_rep, pred, method="joint_full")
    nll = rnnt_loss_from_logits(
        logits, flat_tok, lens_rep, flat_len, blank_id, "none"
    ).reshape(b, n)

    total = transducer_weight * (-nll) + ctc_weight * nbest_scores
    total = jnp.where(nbest_scores > _NEG / 2, total, _NEG)
    best = jnp.argmax(total, axis=1)
    tokens = jnp.take_along_axis(nbest_tokens, best[:, None, None], axis=1)[:, 0]
    lens = jnp.take_along_axis(nbest_lens, best[:, None], axis=1)[:, 0]
    return tokens, lens, total
