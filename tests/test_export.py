"""Serving export round trip: serialize the streaming surface to StableHLO,
reload, and check outputs match the live model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_streaming import causal_model, CHUNK, LEFT, BLANK  # noqa: F401
from tpuasr.config import Config, EncoderConfig, ModelConfig, PredictorConfig, StreamingConfig


def test_export_roundtrip(causal_model, tmp_path, rng):
    from tpuasr.export import export_streaming, load_exported
    from tpuasr.decode.rnnt_streaming import init_streaming_state, process_chunk

    model, params = causal_model
    cfg = Config()
    cfg.model = model.cfg
    cfg.streaming = StreamingConfig(chunk_size=CHUNK, num_left_chunks=LEFT, n_steps=3)

    out = str(tmp_path / "export")
    manifest = export_streaming(model, params, cfg, out, batch=1, max_tokens=20)
    assert set(manifest["functions"]) == {
        "encoder_chunk", "predictor_step", "joint_step", "process_chunk",
    }

    fns = load_exported(out)
    window = manifest["window"]
    feats = rng.standard_normal((1, window, 80)).astype(np.float32)

    # encoder chunk parity
    enc_state = model.apply(params, 1, CHUNK, LEFT, method="init_encoder_state")
    ref_y, ref_state = model.apply(params, feats, enc_state, method="encode_chunk")
    got_y, got_state = fns["encoder_chunk"](feats, jax.tree.map(np.asarray, enc_state))
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y), rtol=1e-5, atol=1e-5)

    # fused process_chunk parity
    st = init_streaming_state(model, params, 1, CHUNK, LEFT, BLANK, 20)
    ref_st = process_chunk(model, params, feats, st, BLANK, 3)
    got_st = fns["process_chunk"](feats, jax.tree.map(np.asarray, st))
    np.testing.assert_array_equal(
        np.asarray(got_st.dec.hyp), np.asarray(ref_st.dec.hyp)
    )
