"""Conformer convolution module.

Parity: wenet/transformer/convolution.py:24-153 — pointwise conv to 2C, GLU,
depthwise conv (causal: left-pad kernel-1 frames, streamed via a cache of the
last kernel-1 input frames), norm + swish, pointwise back to C, with padded
frames zeroed before both convolutions.

TPU note: norm defaults to layer_norm (config) — the reference's batch_norm
needs cross-replica stat sync under data parallelism; wenet already exposes
the norm type (`cnn_module_norm`).

Deliberate divergence from wenet: the streaming cache holds *post-GLU*
activations (wenet caches the raw module input and re-runs the pointwise conv
on it each chunk, convolution.py:122-135). A 1x1 conv is per-frame, so the two
are equivalent except for the value of the initial left padding (zeros here vs
GLU(conv1-bias) there); training (zero pad after GLU) and streaming (zero-init
cache) agree exactly within this framework, which is what the
chunk-vs-full-context equivalence gate requires.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int = 15
    norm: str = "layer_norm"
    causal: bool = False
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def lorder(self) -> int:
        return self.kernel_size - 1 if self.causal else 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, C]
        mask_pad: Optional[jnp.ndarray] = None,  # [B, 1, T] True=valid
        cache: Optional[jnp.ndarray] = None,  # [B, lorder, C] trailing input frames
        deterministic: bool = True,
    ):
        c = self.channels
        if mask_pad is not None:
            x = jnp.where(mask_pad.transpose(0, 2, 1), x, 0)

        # pointwise conv1 + GLU (a 1x1 conv is a Dense over features)
        y = nn.Dense(2 * c, use_bias=self.bias, dtype=self.dtype, name="pointwise_conv1")(x)
        y = y[..., :c] * nn.sigmoid(y[..., c:])

        # depthwise conv over time
        if self.causal:
            lorder = self.kernel_size - 1
            if cache is None:
                y = jnp.pad(y, ((0, 0), (lorder, 0), (0, 0)))
                new_cache = None
            else:
                # NOTE: the cache holds *post-GLU* activations of the previous
                # chunk's last lorder frames; to keep the contract simple the
                # caller stores what we return below.
                y_ext = jnp.concatenate([cache.astype(y.dtype), y], axis=1)
                new_cache = y_ext[:, -lorder:] if lorder > 0 else y_ext[:, :0]
                y = y_ext
            padding = [(0, 0)]
        else:
            assert (self.kernel_size - 1) % 2 == 0
            pad = (self.kernel_size - 1) // 2
            padding = [(pad, pad)]
            new_cache = None
        y = nn.Conv(
            features=c,
            kernel_size=(self.kernel_size,),
            feature_group_count=c,
            padding="VALID" if self.causal else padding,
            use_bias=self.bias,
            dtype=self.dtype,
            name="depthwise_conv",
        )(y)

        if self.norm == "layer_norm":
            y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        elif self.norm == "rms_norm":
            y = nn.RMSNorm(dtype=self.dtype, name="norm")(y)
        elif self.norm == "batch_norm":
            # batch stats over (B, T) of *valid* frames; train-mode running
            # stats handled by BatchNorm collection. use_running_average in
            # eval == deterministic.
            y = nn.BatchNorm(
                use_running_average=deterministic, axis=-1, dtype=self.dtype, name="norm"
            )(y)
        else:
            raise ValueError(f"unknown cnn norm {self.norm}")
        y = y * nn.sigmoid(y)  # swish

        y = nn.Dense(c, use_bias=self.bias, dtype=self.dtype, name="pointwise_conv2")(y)
        if mask_pad is not None:
            y = jnp.where(mask_pad.transpose(0, 2, 1), y, 0)
        return y, new_cache
