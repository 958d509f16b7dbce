#!/usr/bin/env python
"""Isolate the slow piece of the composed train step."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=10):
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

    from tpuasr.audio import fbank_batch
    from tpuasr.config import Config
    from tpuasr.losses import ctc_loss_from_logits, rnnt_loss_from_logits
    from tpuasr.models import Transducer, add_blank

    cfg = Config()
    cfg.feature.sample_rate = 16000
    cfg.model.compute_dtype = "bfloat16"
    cfg.model.encoder.causal = True
    cfg.model.encoder.use_dynamic_chunk = True
    cfg.model.encoder.static_chunk_size = 32

    b, frames, u = 12, 256, 30
    rng = np.random.default_rng(0)
    waves = rng.standard_normal((b, (frames - 1) * 512)).astype(np.float32) * 0.1
    wave_lens = np.full(b, waves.shape[1], np.int32)
    texts = rng.integers(6, cfg.model.vocab_size, (b, u)).astype(np.int32)
    text_lens = np.full(b, u, np.int32)

    model = Transducer(cfg.model)
    feats_t = 1 + waves.shape[1] // 512
    params = model.init(jax.random.PRNGKey(0), np.zeros((b, feats_t, 80), np.float32),
                        np.full(b, feats_t, np.int32), texts, text_lens)

    f_fbank = jax.jit(lambda w, wl: fbank_batch(w, wl, cfg.feature))
    feats, feat_lens = f_fbank(waves, wave_lens)
    feats = np.asarray(feats)
    feat_lens = np.asarray(feat_lens)

    # model forward from features (no fbank)
    f_model = jax.jit(lambda f, fl, tx, tl: model.apply(params, f, fl, tx, tl)["loss"])
    print("model fwd (feats in): %.2f ms" % (timeit(f_model, feats, feat_lens, texts, text_lens) * 1e3), flush=True)

    # pieces composed manually
    def no_ctc(f, fl, tx, tl):
        enc, enc_lens = model.apply(params, f, fl, method="encode")
        pred = model.apply(params, add_blank(tx, 5), method="predict")
        logits = model.apply(params, enc, pred, method="joint_full")
        return rnnt_loss_from_logits(logits, tx, enc_lens, tl, 5, "mean")

    print("enc+pred+joint+rnnt: %.2f ms" % (timeit(jax.jit(no_ctc), feats, feat_lens, texts, text_lens) * 1e3), flush=True)

    def only_ctc(f, fl, tx, tl):
        enc, enc_lens = model.apply(params, f, fl, method="encode")
        logits = model.apply(params, enc, method="ctc_logits")
        return ctc_loss_from_logits(logits, enc_lens, tx, tl, 5, "sum_over_batch")

    print("enc+ctc loss:        %.2f ms" % (timeit(jax.jit(only_ctc), feats, feat_lens, texts, text_lens) * 1e3), flush=True)

    def ctc_only_loss(lg, el, tx, tl):
        return ctc_loss_from_logits(lg, el, tx, tl, 5, "sum_over_batch")

    enc, enc_lens = jax.jit(lambda f, fl: model.apply(params, f, fl, method="encode"))(feats, feat_lens)
    ctc_logits = jax.jit(lambda e: model.apply(params, e, method="ctc_logits"))(enc)
    ctc_logits = jnp.asarray(np.asarray(ctc_logits))
    print("ctc loss alone (pallas): %.2f ms" % (timeit(jax.jit(ctc_only_loss), ctc_logits, enc_lens, texts, text_lens) * 1e3), flush=True)
    print("ctc loss alone (jnp):    %.2f ms" % (
        timeit(jax.jit(lambda lg, el, tx, tl: ctc_loss_from_logits(lg, el, tx, tl, 5, "sum_over_batch", use_pallas=False)),
               ctc_logits, enc_lens, texts, text_lens) * 1e3), flush=True)

    logits = jax.jit(lambda e, p: model.apply(params, e, p, method="joint_full"))(
        enc, jax.jit(lambda y: model.apply(params, y, method="predict"))(add_blank(jnp.asarray(texts), 5)))
    print("rnnt loss alone (pallas): %.2f ms" % (
        timeit(jax.jit(lambda lg: rnnt_loss_from_logits(lg, texts, enc_lens, text_lens, 5, "mean")), logits) * 1e3), flush=True)
    print("rnnt loss alone (jnp):    %.2f ms" % (
        timeit(jax.jit(lambda lg: rnnt_loss_from_logits(lg, texts, enc_lens, text_lens, 5, "mean", use_pallas=False)), logits) * 1e3), flush=True)


if __name__ == "__main__":
    main()
