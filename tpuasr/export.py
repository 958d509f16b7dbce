"""Serving export: serialize the streaming inference surface to StableHLO.

Parity: the reference's TorchScript export surface for the upstream C++
runtime — `forward_encoder_chunk`, `forward_predictor_step`,
`forward_joint_step`, `forward_predictor_init_state`
(wenet/transducer/transducer.py:443-472, wenet/transformer/asr_model.py:340-527)
— re-expressed as `jax.export` artifacts: portable, version-stamped StableHLO
functions a serving runtime loads without Python model code. The exported set
covers both the reference's fine-grained surface and the framework's fused
`process_chunk` (encoder chunk + greedy emission in one program).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _register_state_types():
    """Register the framework's state dataclasses for jax.export
    serialization (auxdata is empty for all of them)."""
    from tpuasr.decode.rnnt_beam import BeamCarry
    from tpuasr.decode.rnnt_greedy import GreedyCarry
    from tpuasr.decode.rnnt_streaming import StreamingBeamState, StreamingState
    from tpuasr.nn.conformer import EncoderStreamState

    for cls in (EncoderStreamState, GreedyCarry, StreamingState,
                StreamingBeamState, BeamCarry):
        try:
            jax.export.register_pytree_node_serialization(
                cls,
                serialized_name=f"tpuasr.{cls.__name__}",
                serialize_auxdata=lambda aux: b"",
                deserialize_auxdata=lambda blob: (),  # no meta fields
            )
        except ValueError:
            pass  # already registered


_register_state_types()


def _specs(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), tree)


def export_streaming(
    model,
    params,
    cfg,
    out_dir: str,
    batch: int = 1,
    max_tokens: int = 200,
) -> dict:
    """Serialize the streaming surface for `batch` parallel streams.

    Artifacts (one .stablehlo file each + manifest.json):
      encoder_chunk     (window_feats, enc_state)        -> (enc_out, enc_state')
      predictor_step    (tokens, pred_state)             -> (pred_out, pred_state')
      joint_step        (enc_t, pred_u)                  -> logits
      process_chunk     (window_feats, streaming_state)  -> streaming_state'
    """
    from tpuasr.decode.rnnt_streaming import init_streaming_state, process_chunk
    from tpuasr.nn.subsampling import SUBSAMPLE_CLASSES
    from tpuasr.streaming.chunkwise import decoding_window

    c = cfg.model
    chunk = cfg.streaming.chunk_size
    left = cfg.streaming.num_left_chunks
    sub = SUBSAMPLE_CLASSES[c.encoder.input_layer]
    window = decoding_window(chunk, sub.subsampling_rate, sub.right_context)
    feat_dim = c.encoder.input_size

    enc_state = model.apply(params, batch, chunk, left, method="init_encoder_state")
    pred_state = model.apply(params, batch, method="init_predictor_state")
    stream_state = init_streaming_state(model, params, batch, chunk, left,
                                        c.blank_id, max_tokens)
    win = jnp.zeros((batch, window, feat_dim), jnp.float32)
    toks = jnp.zeros((batch,), jnp.int32)
    enc_t = jnp.zeros((batch, c.encoder.output_size), jnp.float32)
    pred_u = jnp.zeros((batch, c.predictor.output_size), jnp.float32)

    fns = {
        "encoder_chunk": (
            jax.jit(lambda w, s: model.apply(params, w, s, method="encode_chunk")),
            (win, enc_state),
        ),
        "predictor_step": (
            jax.jit(lambda t, s: model.apply(params, t, s, None, method="predict_step")),
            (toks, pred_state),
        ),
        "joint_step": (
            jax.jit(lambda e, p: model.apply(params, e, p, method="joint_step")),
            (enc_t, pred_u),
        ),
        "process_chunk": (
            jax.jit(lambda w, s: process_chunk(
                model, params, w, s, c.blank_id, cfg.streaming.n_steps)),
            (win, stream_state),
        ),
    }

    os.makedirs(out_dir, exist_ok=True)
    manifest: dict[str, Any] = {"batch": batch, "chunk_size": chunk,
                                "num_left_chunks": left, "window": window,
                                "functions": {}}
    for name, (fn, args) in fns.items():
        exported = jax.export.export(fn)(*jax.tree.map(np.asarray, args))
        blob = exported.serialize()
        path = os.path.join(out_dir, f"{name}.stablehlo")
        with open(path, "wb") as f:
            f.write(blob)
        manifest["functions"][name] = {
            "file": os.path.basename(path),
            "platforms": list(exported.platforms),
        }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(out_dir: str) -> dict:
    """Load exported functions back as callables (jax.export round trip)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    fns = {}
    for name, info in manifest["functions"].items():
        with open(os.path.join(out_dir, info["file"]), "rb") as f:
            exported = jax.export.deserialize(bytearray(f.read()))
        fns[name] = exported.call
    return fns
