#!/usr/bin/env python
"""Difficulty probe for the hard synthetic corpus (data/synthetic.py).

Measures what a *context-free* acoustic classifier can do on isolated token
instances: per-token mean log-mel vectors from a train half, nearest-centroid
classification of a held-out half. This upper-bounds what a model gets from
acoustics alone — the gap to 100% is what noise+jitter destroy, and is the
room the Markov language prior (predictor / beam / rescoring) can win back.

    python tools/hard_corpus_probe.py [--sr 48000] [--snr 10 5 0] \
        [--jitter 8 12 16] [--vocab 412] [--per_token 12]

Prints one row per (snr_db, jitter_mel): top-1 accuracy, top-3 accuracy
(how often the truth is in the confusable set a beam could rescue), and the
mean size of the >1% confusion set.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sr", type=int, default=48000)
    ap.add_argument("--snr", type=float, nargs="*", default=[20.0, 10.0, 5.0, 0.0])
    ap.add_argument("--jitter", type=float, nargs="*", default=[6.0, 12.0, 18.0])
    ap.add_argument("--vocab", type=int, default=412)
    ap.add_argument("--per_token", type=int, default=12)
    ap.add_argument("--frames_per_token", type=int, default=24)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from tpuasr.audio import fbank_batch
    from tpuasr.config import FeatureConfig
    from tpuasr.data.synthetic import hard_chord_table

    feat_cfg = FeatureConfig(sample_rate=args.sr, use_pallas=False)
    spt = args.frames_per_token * feat_cfg.hop_length
    n = args.vocab - 6
    table = hard_chord_table(args.vocab, args.sr)
    fb = jax.jit(lambda w, l: fbank_batch(w, l, feat_cfg)[0])

    print(f"vocab {n} content tokens, {args.per_token} instances each, "
          f"{args.frames_per_token} frames/token @ {args.sr} Hz")
    print(f"{'snr_db':>7} {'jitter':>7} {'top1':>7} {'top3':>7} {'conf_set':>9}")
    for snr in args.snr:
        for jit in args.jitter:
            rng = np.random.default_rng(7)
            waves = np.zeros((n * args.per_token, spt), np.float32)
            labels = np.zeros(n * args.per_token, np.int32)
            i = 0
            for tok in range(6, args.vocab):
                for _ in range(args.per_token):
                    m = table[tok - 6] + rng.normal(0.0, jit, 2)
                    lo, hi = (700.0 * (10 ** (m / 2595.0) - 1.0))
                    t = np.arange(spt) / args.sr
                    sig = 0.5 * (np.sin(2 * np.pi * lo * t) + np.sin(2 * np.pi * hi * t))
                    ns = np.sqrt(np.mean(sig ** 2) / 10 ** (snr / 10.0))
                    w = (sig + ns * rng.standard_normal(spt)).astype(np.float32)
                    w /= max(abs(w.max()), abs(w.min()), 1e-9)
                    waves[i], labels[i] = w * 0.5, tok - 6
                    i += 1
            lens = np.full((len(waves),), spt, np.int32)
            feats = []
            for s in range(0, len(waves), 512):
                f = np.asarray(fb(waves[s:s + 512], lens[s:s + 512]))
                feats.append(f.mean(axis=1))  # [b, 80] mean log-mel
            x = np.concatenate(feats)
            # level invariance: remove per-instance mean (gain shifts all
            # log bins by a constant)
            x = x - x.mean(axis=1, keepdims=True)
            half = args.per_token // 2
            idx = np.arange(len(x)).reshape(n, args.per_token)
            cent = x[idx[:, :half].ravel()].reshape(n, half, -1).mean(1)
            test = x[idx[:, half:].ravel()]
            test_lab = labels[idx[:, half:].ravel()]
            d2 = ((test[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            order = np.argsort(d2, axis=1)
            top1 = float((order[:, 0] == test_lab).mean())
            top3 = float((order[:, :3] == test_lab[:, None]).any(1).mean())
            # mean confusion-set size: #centroids within 1.2x of best dist
            best = d2.min(axis=1, keepdims=True)
            conf = float((d2 <= 1.44 * best).sum(1).mean())
            print(f"{snr:>7.1f} {jit:>7.1f} {top1:>7.3f} {top3:>7.3f} {conf:>9.2f}")


if __name__ == "__main__":
    main()
