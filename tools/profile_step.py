#!/usr/bin/env python
"""Break down flagship train-step time on the current backend: fbank,
encoder fwd, predictor+joint+loss fwd, full grad step."""

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
    from tpuasr.losses import rnnt_loss_from_logits, ctc_loss_from_logits
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
    t_fbank = timeit(f_fbank, waves, wave_lens)
    feats, feat_lens = f_fbank(waves, wave_lens)

    f_enc = jax.jit(lambda f, fl: model.apply(params, f, fl, method="encode"))
    t_enc = timeit(f_enc, feats, feat_lens)
    enc, enc_lens = f_enc(feats, feat_lens)

    ys_in = add_blank(jnp.asarray(texts), cfg.model.blank_id)

    f_pred = jax.jit(lambda y: model.apply(params, y, method="predict"))
    t_pred = timeit(f_pred, ys_in)
    pred = f_pred(ys_in)

    f_joint = jax.jit(lambda e, p: model.apply(params, e, p, method="joint_full"))
    t_joint = timeit(f_joint, enc, pred)
    logits = f_joint(enc, pred)

    f_loss = jax.jit(lambda lg: rnnt_loss_from_logits(lg, texts, enc_lens, text_lens,
                                                      cfg.model.blank_id, "mean"))
    t_loss = timeit(f_loss, logits)

    def full(p, w, wl, tx, tl):
        f, fl = fbank_batch(w, wl, cfg.feature)
        return model.apply(p, f, fl, tx, tl)["loss"]

    f_fwd = jax.jit(full)
    t_fwd = timeit(f_fwd, params, waves, wave_lens, texts, text_lens)
    f_grad = jax.jit(jax.grad(lambda p, *a: full(p, *a)))
    t_grad = timeit(f_grad, params, waves, wave_lens, texts, text_lens, n=5)

    audio_s = b * waves.shape[1] / cfg.feature.sample_rate
    print(f"audio per batch: {audio_s:.1f}s")
    for name, t in [("fbank", t_fbank), ("encoder fwd", t_enc), ("predictor fwd", t_pred),
                    ("joint fwd", t_joint), ("rnnt loss fwd", t_loss),
                    ("full fwd", t_fwd), ("full grad", t_grad)]:
        print(f"{name:15s} {t * 1e3:8.2f} ms   ({audio_s / t:9.0f} audio-s/s)")


if __name__ == "__main__":
    main()
