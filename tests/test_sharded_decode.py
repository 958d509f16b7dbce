"""Mesh-sharded batched streaming decode == single-device decode.

BASELINE configs[4] north star: batched frame-sync search scaled across a
pod slice by sharding streams over the mesh's data axis. Partitioning a
per-stream-independent computation must not change any hypothesis — greedy
tokens, beam tokens, and lengths are asserted identical to the unsharded
decode (reference protocol: online_rnnt_eval.py:114-142 runs one python
stream loop per GPU; here one jit serves the whole mesh)."""

import jax
import numpy as np
import pytest

from tests.test_streaming import BLANK, CHUNK, LEFT, causal_cfg
from tpuasr.decode.rnnt_streaming import (
    streaming_beam_decode, streaming_greedy_decode,
)
from tpuasr.models import Transducer
from tpuasr.parallel import make_mesh, make_sharded_streaming_decode

B, T = 8, 93  # one stream per device on the 8-device CPU mesh


@pytest.fixture(scope="module")
def setup():
    model = Transducer(causal_cfg())
    r = np.random.default_rng(7)
    feats = r.standard_normal((B, T, 80)).astype(np.float32)
    feat_lens = np.asarray([T, 51, T, 33, 77, T, 62, 45], np.int32)
    params = model.init(
        jax.random.PRNGKey(0), feats, feat_lens,
        np.zeros((B, 5), np.int32), np.full((B,), 5, np.int32),
    )
    return model, params, feats, feat_lens


@pytest.mark.parametrize("mode", ["greedy", "beam"])
def test_sharded_decode_matches_single_device(setup, mode):
    model, params, feats, feat_lens = setup
    if mode == "greedy":
        ref_t, ref_l, _ = streaming_greedy_decode(
            model, params, feats, feat_lens, CHUNK, LEFT, BLANK, max_tokens=24)
    else:
        ref_t, ref_l, _ = streaming_beam_decode(
            model, params, feats, feat_lens, CHUNK, LEFT, BLANK,
            beam_size=3, max_tokens=24, ctc_weight=0.3)

    mesh = make_mesh()
    decode = make_sharded_streaming_decode(
        model, mesh, mode, chunk_size=CHUNK, num_left_chunks=LEFT,
        blank_id=BLANK, beam_size=3, max_tokens=24,
        ctc_weight=0.3 if mode == "beam" else 0.0)
    from tpuasr.parallel import batch_sharding

    sh = batch_sharding(mesh)
    toks, lens = decode(params, jax.device_put(feats, sh),
                        jax.device_put(feat_lens, sh))

    # outputs live sharded on the mesh; each device held B/n streams
    assert len(toks.sharding.device_set) == len(mesh.devices.flat)
    np.testing.assert_array_equal(np.asarray(lens), np.asarray(ref_l))
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_t))
