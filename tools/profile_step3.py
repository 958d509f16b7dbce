#!/usr/bin/env python
"""Find the superlinear composition cost in the train forward."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from tpuasr.config import Config
    from tpuasr.losses import rnnt_loss_from_logits
    from tpuasr.models import Transducer, add_blank

    cfg = Config()
    cfg.feature.sample_rate = 16000
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.encoder.causal = True
    cfg.model.encoder.use_dynamic_chunk = True
    cfg.model.encoder.static_chunk_size = 32

    b, frames, u = 12, 256, 30
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((b, frames, 80)).astype(np.float32)
    feat_lens = np.full(b, frames, np.int32)
    texts = rng.integers(6, cfg.model.vocab_size, (b, u)).astype(np.int32)
    text_lens = np.full(b, u, np.int32)

    model = Transducer(cfg.model)
    params = model.init(jax.random.PRNGKey(0), feats, feat_lens, texts, text_lens)

    def enc_only(f, fl):
        return model.apply(params, f, fl, method="encode")[0]

    def enc_pred(f, fl, tx):
        enc, _ = model.apply(params, f, fl, method="encode")
        pred = model.apply(params, add_blank(tx, 5), method="predict")
        return enc.sum() + pred.sum()

    def enc_pred_joint(f, fl, tx):
        enc, _ = model.apply(params, f, fl, method="encode")
        pred = model.apply(params, add_blank(tx, 5), method="predict")
        return model.apply(params, enc, pred, method="joint_full").sum()

    def enc_pred_joint_lsm(f, fl, tx, tl):
        enc, enc_lens = model.apply(params, f, fl, method="encode")
        pred = model.apply(params, add_blank(tx, 5), method="predict")
        logits = model.apply(params, enc, pred, method="joint_full")
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1).sum()

    def enc_pred_joint_rnnt(f, fl, tx, tl):
        enc, enc_lens = model.apply(params, f, fl, method="encode")
        pred = model.apply(params, add_blank(tx, 5), method="predict")
        logits = model.apply(params, enc, pred, method="joint_full")
        return rnnt_loss_from_logits(logits, tx, enc_lens, tl, 5, "mean")

    def enc_pred_joint_rnnt_jnp(f, fl, tx, tl):
        enc, enc_lens = model.apply(params, f, fl, method="encode")
        pred = model.apply(params, add_blank(tx, 5), method="predict")
        logits = model.apply(params, enc, pred, method="joint_full")
        return rnnt_loss_from_logits(logits, tx, enc_lens, tl, 5, "mean",
                                     use_pallas=False)

    for name, fn, args in [
        ("enc only", enc_only, (feats, feat_lens)),
        ("enc+pred", enc_pred, (feats, feat_lens, texts)),
        ("enc+pred+joint", enc_pred_joint, (feats, feat_lens, texts)),
        ("enc+pred+joint+lsm", enc_pred_joint_lsm, (feats, feat_lens, texts, text_lens)),
        ("enc+pred+joint+rnnt(pallas)", enc_pred_joint_rnnt, (feats, feat_lens, texts, text_lens)),
        ("enc+pred+joint+rnnt(jnp)", enc_pred_joint_rnnt_jnp, (feats, feat_lens, texts, text_lens)),
    ]:
        t = timeit(jax.jit(fn), *args)
        print(f"{name:30s} {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
