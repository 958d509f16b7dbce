#!/usr/bin/env python
"""Compute global CMVN stats over a training split (wenet
tools/compute_cmvn_stats role; stats consumed by tpuasr.audio.cmvn)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--wav_scp", required=True)
    ap.add_argument("--text", required=True)
    ap.add_argument("--out", default="cmvn.json")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--max_utts", type=int, default=0)
    args = ap.parse_args()

    from tpuasr.audio import fbank
    from tpuasr.audio.cmvn import compute_cmvn_stats, save_cmvn
    from tpuasr.config import FeatureConfig
    from tpuasr.data.bznsyp import iter_utterances, read_wav

    cfg = FeatureConfig()
    feats_list, lens_list = [], []
    for i, (utt, path, _) in enumerate(iter_utterances(args.wav_scp, args.text,
                                                       args.data_root)):
        if args.max_utts and i >= args.max_utts:
            break
        wave, sr = read_wav(path)
        cfg.sample_rate = sr
        f = np.asarray(fbank(wave, cfg))
        feats_list.append(f[None])
        lens_list.append(np.array([f.shape[0]], np.int32))
    mean, istd = compute_cmvn_stats(feats_list, lens_list)
    save_cmvn(args.out, mean, istd)
    print(f"wrote {args.out} over {len(feats_list)} utterances")


if __name__ == "__main__":
    main()
