"""Scanned layer stack (encoder.scan_layers) parity with the unrolled stack.

The scanned encoder compiles ONE conformer block body and `lax.scan`s it over
stacked [L, ...] parameters (VERDICT r3: the unrolled 12-layer stack showed a
thousands-of-tiny-programs trace signature). These tests pin the contract:
with parameters converted by `stack_layer_params`, the scanned model computes
the same forward, the same streaming chunks, and the same gradients as the
unrolled one — so flipping the flag is purely a compilation-layout choice.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuasr.config import EncoderConfig, ModelConfig, PredictorConfig
from tpuasr.nn.conformer import (
    ConformerEncoder,
    stack_layer_params,
    unstack_layer_params,
)

L = 3


def _enc_cfg(**kw):
    base = dict(
        output_size=32, attention_heads=2, linear_units=48, num_blocks=L,
        cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, causal=True, use_dynamic_chunk=False,
        static_chunk_size=4, input_layer="conv2d",
    )
    base.update(kw)
    return EncoderConfig(**base)


def _pair(**kw):
    cfg_u = _enc_cfg(**kw)
    cfg_s = dataclasses.replace(cfg_u, scan_layers=True)
    return ConformerEncoder(cfg_u), ConformerEncoder(cfg_s)


def _init(enc, b=2, t=37):
    feats = np.random.default_rng(0).normal(size=(b, t, 80)).astype(np.float32)
    lens = np.asarray([t, t - 9], np.int32)[:b]
    params = enc.init(jax.random.PRNGKey(0), feats, lens)
    return params, feats, lens


def _to_scanned(params):
    return {"params": stack_layer_params(params["params"], L)}


def test_converter_roundtrip():
    enc_u, _ = _pair()
    params, _, _ = _init(enc_u)
    stacked = stack_layer_params(params["params"], L)
    assert "layers" in stacked and "block0" not in stacked
    back = unstack_layer_params(stacked, L)
    jax.tree.map(np.testing.assert_array_equal, back, params["params"])


def test_forward_parity():
    enc_u, enc_s = _pair()
    params, feats, lens = _init(enc_u)
    ys_u, mask_u = enc_u.apply(params, feats, lens)
    ys_s, mask_s = enc_s.apply(_to_scanned(params), feats, lens)
    np.testing.assert_array_equal(np.asarray(mask_u), np.asarray(mask_s))
    np.testing.assert_allclose(np.asarray(ys_u), np.asarray(ys_s),
                               rtol=1e-6, atol=1e-6)


def test_forward_parity_chunk_masked():
    enc_u, enc_s = _pair(use_dynamic_chunk=True)
    params, feats, lens = _init(enc_u)
    rng = jax.random.PRNGKey(7)
    ys_u, _ = enc_u.apply(params, feats, lens, chunk_rng=rng)
    ys_s, _ = enc_s.apply(_to_scanned(params), feats, lens, chunk_rng=rng)
    np.testing.assert_allclose(np.asarray(ys_u), np.asarray(ys_s),
                               rtol=1e-6, atol=1e-6)


def test_streaming_chunk_parity():
    enc_u, enc_s = _pair()
    params, _, _ = _init(enc_u)
    sp = _to_scanned(params)
    b, chunk, left = 2, 4, 3
    sub = enc_u.subsampling_rate
    window = (chunk - 1) * sub + enc_u.right_context + 1
    rng = np.random.default_rng(1)

    st_u = enc_u.init_stream_state(b, chunk, left)
    st_s = enc_s.init_stream_state(b, chunk, left)
    for _ in range(3):
        xs = rng.normal(size=(b, window, 80)).astype(np.float32)
        ys_u, st_u = enc_u.apply(params, xs, st_u, method=enc_u.forward_chunk)
        ys_s, st_s = enc_s.apply(sp, xs, st_s, method=enc_s.forward_chunk)
        np.testing.assert_allclose(np.asarray(ys_u), np.asarray(ys_s),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_u.att_k), np.asarray(st_s.att_k),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_u.cnn), np.asarray(st_s.cnn),
                                   rtol=1e-6, atol=1e-6)
        assert int(st_u.offset) == int(st_s.offset)


def test_grad_parity():
    enc_u, enc_s = _pair()
    params, feats, lens = _init(enc_u)

    def loss_u(p):
        ys, _ = enc_u.apply({"params": p}, feats, lens)
        return jnp.sum(ys ** 2)

    def loss_s(p):
        ys, _ = enc_s.apply({"params": p}, feats, lens)
        return jnp.sum(ys ** 2)

    g_u = jax.grad(loss_u)(params["params"])
    g_s = jax.grad(loss_s)(stack_layer_params(params["params"], L))
    g_u_stacked = stack_layer_params(g_u, L)

    def cmp(a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)

    jax.tree.map(cmp, g_u_stacked, g_s)


def test_dropout_train_mode_runs():
    # stochastic path: per-layer dropout rngs are split by the scan — just
    # assert the train-mode forward runs and is finite (bit-level rng
    # assignment differs from the unrolled stack by design)
    _, enc_s = _pair(dropout_rate=0.1)
    params, feats, lens = _init(enc_s)
    ys, _ = enc_s.apply(params, feats, lens, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(ys)).all()


def test_checkpoint_layout_migration(tmp_path):
    """A pre-scan (unrolled) TrainState checkpoint restores into a
    scan_layers model via restore_checkpoint_migrating — params AND
    optimizer-moment trees are restacked."""
    from tpuasr.config import OptimConfig
    from tpuasr.train import TrainState, make_optimizer
    from tpuasr.train.checkpoint import (
        restore_checkpoint_migrating, save_checkpoint,
    )

    enc_u, enc_s = _pair()
    params_u, feats, lens = _init(enc_u)
    tx = make_optimizer(OptimConfig(warmup_steps=2))
    state_u = TrainState.create(params_u, tx)
    state_u = state_u.replace(step=state_u.step + 17)
    path = str(tmp_path / "ckpt_unrolled")
    save_checkpoint(path, state_u)

    params_s = enc_s.init(jax.random.PRNGKey(9), feats, lens)
    state_s = TrainState.create(params_s, tx)
    restored = restore_checkpoint_migrating(path, state_s, L)
    assert int(restored.step) == 17
    expect = stack_layer_params(params_u["params"], L)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        expect, restored.params["params"])

    # and the mirror direction: scanned checkpoint -> unrolled model
    path2 = str(tmp_path / "ckpt_scanned")
    save_checkpoint(path2, restored)
    back = restore_checkpoint_migrating(path2, TrainState.create(params_u, tx), L)
    assert int(back.step) == 17
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params_u["params"], back.params["params"])


def test_transducer_train_step_scan():
    """Full hybrid-loss train step with scan_layers=True: loss matches the
    unrolled model given converted params."""
    from tpuasr.models import Transducer

    enc = _enc_cfg()
    mk = dict(
        vocab_size=32, blank_id=5,
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=24),
    )
    m_u = Transducer(ModelConfig(encoder=enc, **mk))
    m_s = Transducer(ModelConfig(
        encoder=dataclasses.replace(enc, scan_layers=True), **mk))

    b, t, u = 2, 37, 5
    feats = np.random.default_rng(2).normal(size=(b, t, 80)).astype(np.float32)
    lens = np.asarray([t, t - 9], np.int32)
    texts = np.asarray(np.random.default_rng(3).integers(6, 32, (b, u)), np.int32)
    tlens = np.asarray([u, u - 2], np.int32)

    params = m_u.init(jax.random.PRNGKey(0), feats, lens, texts, tlens)
    conv = dict(params["params"])
    conv["encoder"] = stack_layer_params(conv["encoder"], L)
    out_u = m_u.apply(params, feats, lens, texts, tlens)
    out_s = m_s.apply({"params": conv}, feats, lens, texts, tlens)
    np.testing.assert_allclose(float(out_u["loss"]), float(out_s["loss"]),
                               rtol=1e-5)
