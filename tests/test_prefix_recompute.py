"""Prefix-recompute streaming for non-conformer families: incremental outputs
must equal the full chunk-masked forward (squeezeformer example)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpuasr.nn.squeezeformer import SqueezeformerConfig, SqueezeformerEncoder
from tpuasr.streaming.prefix_recompute import chunked_prefix_encode


def test_squeezeformer_prefix_streaming(rng):
    cfg = SqueezeformerConfig(
        encoder_dim=32, output_size=32, attention_heads=2, num_blocks=2,
        reduce_idx=(), recover_idx=(), feed_forward_expansion_factor=2,
        cnn_module_kernel=7, dropout_rate=0.0,
        use_dynamic_chunk=True, static_chunk_size=4,
    )
    model = SqueezeformerEncoder(cfg)
    t = 131
    feats = rng.standard_normal((1, t, 80)).astype(np.float32)
    lens = np.array([t], np.int32)
    params = model.init(jax.random.PRNGKey(0), feats, lens)

    def encode(f, l):
        return model.apply(params, f, l, decoding_chunk_size=4,
                           num_decoding_left_chunks=-1)

    full, _ = encode(jnp.asarray(feats), jnp.asarray(lens))

    from tpuasr.nn.squeezeformer import DepthwiseConv2dSubsampling4

    # non-causal conv modules: each block's k=7 conv looks 3 frames ahead and
    # in-chunk attention propagates up to chunk_size-1 more per block, so
    # withhold num_blocks * (chunk - 1 + k//2) encoder frames
    outs = chunked_prefix_encode(
        encode, jnp.asarray(feats), jnp.asarray(lens), chunk_size=4,
        subsampling_rate=4, right_context=6,
        out_len_fn=DepthwiseConv2dSubsampling4.output_len,
        lookahead=2 * (4 - 1 + 3),
    )
    inc = np.concatenate([np.asarray(o) for o in outs], axis=1)
    np.testing.assert_allclose(inc, np.asarray(full)[:, :inc.shape[1]],
                               rtol=2e-3, atol=2e-3)
