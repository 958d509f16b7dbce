"""ZeRO optimizer-state / parameter sharding (fsdp_utils.py:38-115 parity).

Gates on the 8-virtual-device CPU mesh:
- zero1/zero3 train steps produce the same loss trajectory and parameters
  as the replicated baseline (multi-step, tight tolerance);
- the optimizer-moment leaves are actually split 1/n per device.
"""

import jax
import numpy as np
import pytest

from tpuasr.config import Config, EncoderConfig, ModelConfig, PredictorConfig
from tpuasr.data.pipeline import BatchSpec, device_view, make_batch
from tpuasr.data.synthetic import synth_corpus
from tpuasr.models import Transducer
from tpuasr.parallel import (
    assert_sharded,
    make_mesh,
    shard_batch,
    shard_train_state,
    train_state_shardings,
)
from tpuasr.train import TrainState, make_optimizer, make_train_step


def tiny_setup():
    cfg = Config()
    cfg.model = ModelConfig(
        vocab_size=64, blank_id=5,
        encoder=EncoderConfig(
            output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
            cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
            causal=True, use_dynamic_chunk=True, static_chunk_size=4,
        ),
        predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
    )
    cfg.feature.sample_rate = 16000
    model = Transducer(cfg.model)
    b = 8
    utts = synth_corpus(b, cfg.model.vocab_size, seed=0, min_tokens=2,
                        max_tokens=3, samples_per_token=4096)
    batch = device_view(make_batch(utts, BatchSpec(b, 24 * 512, 6)))
    feats_t = 1 + batch["waves"].shape[1] // cfg.feature.hop_length
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((b, feats_t, 80), np.float32),
        np.full((b,), feats_t, np.int32),
        batch["texts"], batch["text_lens"],
    )
    return cfg, model, params, batch


def run_steps(cfg, model, params, batch, mesh, stage, n_steps=3):
    tx = make_optimizer(cfg.optim)
    state = TrainState.create(params, tx)
    shardings = None
    if stage != "none":
        shardings = train_state_shardings(state, mesh, stage)
        state = shard_train_state(state, shardings)
    step = make_train_step(model, tx, cfg, donate=False,
                           state_shardings=shardings)
    sharded = shard_batch(batch, mesh)
    losses = []
    with jax.set_mesh(mesh):
        for i in range(n_steps):
            state, metrics = step(state, sharded, jax.random.PRNGKey(1))
            losses.append(float(metrics["loss"]))
    return losses, state


@pytest.mark.parametrize("stage", ["zero1", "zero3"])
def test_zero_matches_replicated(stage):
    cfg, model, params, batch = tiny_setup()
    mesh = make_mesh(jax.devices("cpu")[:8])

    base_losses, base_state = run_steps(cfg, model, params, batch, mesh, "none")
    z_losses, z_state = run_steps(cfg, model, params, batch, mesh, stage)

    np.testing.assert_allclose(z_losses, base_losses, rtol=1e-5, atol=1e-5)
    # parameters after multiple sharded updates match the replicated run
    base_flat = jax.tree.leaves(base_state.params)
    z_flat = jax.tree.leaves(z_state.params)
    for a, b in zip(base_flat, z_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
    assert_sharded(z_state, mesh, stage)


def test_zero3_param_leaves_are_split():
    cfg, model, params, batch = tiny_setup()
    mesh = make_mesh(jax.devices("cpu")[:8])
    _, state = run_steps(cfg, model, params, batch, mesh, "zero3", n_steps=1)
    n = mesh.shape["data"]
    split = 0
    for leaf in jax.tree.leaves(state.params):
        if leaf.ndim == 0 or all(d % n != 0 for d in leaf.shape):
            continue
        shard = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard)) * n == int(np.prod(leaf.shape))
        split += 1
    assert split > 0
