"""Global CMVN: (x - mean) * istd over features.

Parity: wenet/transformer/cmvn.py:18-40 (GlobalCMVN module) +
wenet/utils/cmvn.py (stats loading). Stats are computed corpus-wide by
`compute_cmvn_stats` (the wenet tools/compute_cmvn_stats role) and applied as
a pure function before the encoder."""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np


def apply_cmvn(feats: jnp.ndarray, mean: jnp.ndarray, istd: jnp.ndarray,
               norm_var: bool = True) -> jnp.ndarray:
    out = feats - mean
    if norm_var:
        out = out * istd
    return out


def compute_cmvn_stats(feature_batches, feat_lens_batches=None):
    """Accumulate corpus mean/istd over [.., T, F] feature arrays."""
    total = None
    total_sq = None
    count = 0
    for i, feats in enumerate(feature_batches):
        feats = np.asarray(feats, np.float64)
        if feats.ndim == 2:
            feats = feats[None]
        if feat_lens_batches is not None:
            lens = np.asarray(feat_lens_batches[i])
            mask = np.arange(feats.shape[1])[None, :] < lens[:, None]
            w = mask[..., None].astype(np.float64)
            s = (feats * w).sum((0, 1))
            sq = (feats * feats * w).sum((0, 1))
            count += int(mask.sum())
        else:
            s = feats.sum((0, 1))
            sq = (feats * feats).sum((0, 1))
            count += feats.shape[0] * feats.shape[1]
        total = s if total is None else total + s
        total_sq = sq if total_sq is None else total_sq + sq
    mean = total / count
    var = np.maximum(total_sq / count - mean * mean, 1e-20)
    return mean.astype(np.float32), (1.0 / np.sqrt(var)).astype(np.float32)


def save_cmvn(path: str, mean: np.ndarray, istd: np.ndarray) -> None:
    with open(path, "w") as f:
        json.dump({"mean": mean.tolist(), "istd": istd.tolist()}, f)


def load_cmvn(path: str):
    with open(path) as f:
        d = json.load(f)
    return np.asarray(d["mean"], np.float32), np.asarray(d["istd"], np.float32)


def _stats_to_mean_istd(mean_stat, var_stat, frame_num):
    mean = np.asarray(mean_stat, np.float64) / frame_num
    var = np.asarray(var_stat, np.float64) / frame_num - mean * mean
    var = np.maximum(var, 1e-20)
    return mean.astype(np.float32), (1.0 / np.sqrt(var)).astype(np.float32)


def load_cmvn_json_stats(path: str):
    """wenet json-format accumulated stats -> (mean, istd)
    (wenet/utils/cmvn.py:21-43: keys mean_stat / var_stat / frame_num)."""
    with open(path) as f:
        stats = json.load(f)
    return _stats_to_mean_istd(
        stats["mean_stat"], stats["var_stat"], float(stats["frame_num"])
    )


def load_cmvn_kaldi(path: str):
    """kaldi text-format global cmvn (`compute-cmvn-stats --binary=false`)
    -> (mean, istd) (wenet/utils/cmvn.py:46-85).

    Layout: `[ m_1 .. m_F count  v_1 .. v_F 0 ]` — accumulated sums, the
    frame count after the means, a trailing zero after the variances."""
    with open(path, "rb") as f:
        if f.read(2) == b"\0B":
            raise ValueError(
                "kaldi binary cmvn is not supported; recompute with "
                "compute-cmvn-stats --binary=false"
            )
    with open(path) as f:
        arr = f.read().split()
    if arr[0] != "[" or arr[-1] != "]" or arr[-2] != "0":
        raise ValueError(f"not a kaldi text cmvn file: {path}")
    feat_dim = (len(arr) - 4) // 2
    mean_stat = [float(x) for x in arr[1 : 1 + feat_dim]]
    frame_num = float(arr[1 + feat_dim])
    var_stat = [float(x) for x in arr[2 + feat_dim : 2 + 2 * feat_dim]]
    return _stats_to_mean_istd(mean_stat, var_stat, frame_num)
