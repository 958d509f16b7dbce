"""Mesh-sharded batched streaming decode (BASELINE configs[4] north star:
"batched frame-sync beam search across a pod slice").

The streaming greedy / beam decoders (tpuasr.decode.rnnt_streaming) are pure
batched functions whose entire state — encoder ring caches, predictor LSTM
state, beam hypothesis tensors — carries a leading stream (batch) dimension.
Scaling them across chips is therefore a sharding annotation, not an
algorithm change: streams split over the mesh's `data` axis, params stay
replicated, and XLA partitions every per-stream tensor (including the
[B, beam, Umax] hypothesis state threaded through `lax.scan`) with zero
collectives on the decode path. Collectives only appear at the metrics
reduction (cross-host CER count psum, tpuasr.eval.cer) — the same layout the
reference approximates with per-GPU python loops + gather
(model/online_rnnt_model.py:274-387, rnnt_eval.py:98-117).

Per-device hypotheses are bit-identical to the single-device decode: the
computation is embarrassingly parallel over streams, so partitioning cannot
change results (asserted in tests/test_sharded_decode.py and the driver's
`dryrun_multichip`).
"""

from __future__ import annotations

import jax

from tpuasr.parallel.mesh import batch_sharding, replicated_sharding


def make_sharded_streaming_decode(
    model,
    mesh,
    mode: str = "greedy",
    data_axis: str = "data",
    *,
    chunk_size: int,
    num_left_chunks: int,
    blank_id: int,
    beam_size: int = 4,
    n_steps: int = 0,  # 0 = per-mode default (greedy 10, beam 1)
    max_tokens: int = 200,
    ctc_weight: float = 0.0,
    transducer_weight: float = 0.7,
):
    """-> jitted `(params, feats [B,T,F], feat_lens [B]) -> (tokens, lens)`
    with streams sharded over `data_axis` (B must divide by the axis size).

    `mode`: "greedy" (streaming_greedy_decode) or "beam"
    (streaming_beam_decode, per-frame CTC shallow fusion via `ctc_weight`).
    """
    from tpuasr.decode.rnnt_streaming import (
        streaming_beam_decode, streaming_greedy_decode,
    )

    bs = batch_sharding(mesh, data_axis)
    rs = replicated_sharding(mesh)

    if mode == "greedy":
        def fn(params, feats, feat_lens):
            toks, lens, _ = streaming_greedy_decode(
                model, params, feats, feat_lens, chunk_size, num_left_chunks,
                blank_id, n_steps=n_steps or 10, max_tokens=max_tokens,
            )
            return toks, lens
    elif mode == "beam":
        def fn(params, feats, feat_lens):
            toks, lens, _ = streaming_beam_decode(
                model, params, feats, feat_lens, chunk_size, num_left_chunks,
                blank_id, beam_size=beam_size, max_tokens=max_tokens,
                n_steps=n_steps or 1,
                ctc_weight=ctc_weight, transducer_weight=transducer_weight,
            )
            return toks, lens
    else:
        raise ValueError(f"mode must be greedy|beam, got {mode!r}")

    return jax.jit(fn, in_shardings=(rs, bs, bs), out_shardings=(bs, bs))
