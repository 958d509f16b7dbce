"""Conv subsampling front-ends.

Parity: wenet/transformer/subsampling.py:24-394 — unpadded (VALID) 2D convs
with stride 2, exposing `subsampling_rate` and `right_context` so the
streaming driver can compute the raw-frame window per chunk
(decoding_window = (chunk - 1) * rate + right_context + 1,
encoder.py:334-336). Output length for each k=3,s=2 VALID conv is
(T - 1) // 2 - ... identical to torch's floor((T - 3)/2) + 1.

No subsampling cache in streaming: chunks arrive as overlapping raw-frame
windows (wenet's choice, encoder.py:320-333) — recomputing a few conv frames
is far cheaper than a stateful multi-rate conv cache.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Conv2dSubsampling4(nn.Module):
    """Two k=3,s=2 VALID Conv2d + Linear; rate 4, right_context 6."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    subsampling_rate = 4
    right_context = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, F] -> [B, T', D]
        b, t, f = x.shape
        y = x[..., None]  # [B, T, F, 1]
        y = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(y))
        y = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv2")(y))
        bt, tt, ff, c = y.shape
        y = y.reshape(bt, tt, ff * c)
        return nn.Dense(self.odim, dtype=self.dtype, name="out")(y)

    @staticmethod
    def output_len(t):
        return (((t - 1) // 2) - 1) // 2

    @staticmethod
    def window_for_chunk(chunk: int) -> int:
        return (chunk - 1) * 4 + 6 + 1


class Conv2dSubsampling6(nn.Module):
    """k=3,s=2 then k=5,s=3; rate 6, right_context 10."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    subsampling_rate = 6
    right_context = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x[..., None]
        y = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(y))
        y = nn.relu(nn.Conv(self.odim, (5, 5), strides=(3, 3), padding="VALID",
                            dtype=self.dtype, name="conv2")(y))
        bt, tt, ff, c = y.shape
        return nn.Dense(self.odim, dtype=self.dtype, name="out")(y.reshape(bt, tt, ff * c))

    @staticmethod
    def output_len(t):
        return (((t - 1) // 2) - 2) // 3


class Conv2dSubsampling8(nn.Module):
    """Three k=3,s=2 convs; rate 8, right_context 14."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    subsampling_rate = 8
    right_context = 14

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x[..., None]
        for i in range(3):
            y = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                                dtype=self.dtype, name=f"conv{i + 1}")(y))
        bt, tt, ff, c = y.shape
        return nn.Dense(self.odim, dtype=self.dtype, name="out")(y.reshape(bt, tt, ff * c))

    @staticmethod
    def output_len(t):
        return ((((t - 1) // 2) - 1) // 2 - 1) // 2


class LinearNoSubsampling(nn.Module):
    """Linear embed, rate 1, right_context 0."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    subsampling_rate = 1
    right_context = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.odim, dtype=self.dtype, name="linear")(x)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return y

    @staticmethod
    def output_len(t):
        return t


class Conv1dSubsampling2(nn.Module):
    """Two 1D convs over time (k=3, SAME-style pad 1; second strides 2) with
    GELU — the Whisper front-end (wenet subsampling.py:116-160); rate 2,
    right_context 4."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    subsampling_rate = 2
    right_context = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, F] -> [B, T', D]
        y = nn.Conv(self.odim, (3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv1")(x)
        y = nn.gelu(y)
        y = nn.Conv(self.odim, (3,), strides=(2,), padding=[(1, 1)],
                    dtype=self.dtype, name="conv2")(y)
        return nn.gelu(y)

    @staticmethod
    def output_len(t):
        return (t - 1) // 2 + 1


class StackNFramesSubsampling(nn.Module):
    """Stack `stride` consecutive frames and project: LayerNorm + Linear over
    [B, T/stride, idim*stride] (wenet subsampling.py:338-394); rate = stride,
    right_context 0 (fully chunk-local)."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    stride: int = 2
    subsampling_rate = 2
    right_context = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, f = x.shape
        s = self.stride
        t_trunc = t // s * s
        y = x[:, :t_trunc].reshape(b, t_trunc // s, f * s)
        y = nn.LayerNorm(dtype=self.dtype, name="norm")(y)
        return nn.Dense(self.odim, dtype=self.dtype, name="out")(y)

    @staticmethod
    def output_len(t):
        return t // 2


class FireRedConv2dSubsampling4(nn.Module):
    """FireRed's odd conv2d x4 front-end (wenet firered/subsampling.py:22-74):
    the input is zero-padded by right_context (6) frames *before* the convs,
    with fixed 32 conv channels; rate 4, right_context 6."""

    odim: int
    dtype: jnp.dtype = jnp.float32
    conv_channels: int = 32
    subsampling_rate = 4
    right_context = 6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, self.right_context), (0, 0)))
        y = x[..., None]
        y = nn.relu(nn.Conv(self.conv_channels, (3, 3), strides=(2, 2),
                            padding="VALID", dtype=self.dtype, name="conv1")(y))
        y = nn.relu(nn.Conv(self.conv_channels, (3, 3), strides=(2, 2),
                            padding="VALID", dtype=self.dtype, name="conv2")(y))
        b, t, f, c = y.shape
        return nn.Dense(self.odim, dtype=self.dtype, name="out")(y.reshape(b, t, f * c))

    @staticmethod
    def output_len(t):
        return ((t + 5) // 2 - 1) // 2


SUBSAMPLE_CLASSES = {
    "linear": LinearNoSubsampling,
    "conv1d2": Conv1dSubsampling2,
    "conv2d_firered": FireRedConv2dSubsampling4,
    "conv2d": Conv2dSubsampling4,
    "conv2d6": Conv2dSubsampling6,
    "conv2d8": Conv2dSubsampling8,
    "stack2": StackNFramesSubsampling,
}


def subsampled_len(input_layer: str, t):
    return SUBSAMPLE_CLASSES[input_layer].output_len(t)


def subsampled_mask(mask: jnp.ndarray, input_layer: str) -> jnp.ndarray:
    """Subsample a [B, 1, T] mask the way wenet slices it (e.g. [2::2][2::2])."""
    if input_layer == "linear":
        return mask
    if input_layer == "conv1d2":
        return mask[:, :, ::2]
    if input_layer == "conv2d_firered":
        # firered extends every utterance's valid length by right_context
        # before subsampling the mask (firered subsampling.py:62-74)
        t = mask.shape[-1] + 6
        lens = mask.sum(axis=-1, keepdims=True) + 6  # [B, 1, 1]-ish
        m = jnp.arange(t)[None, None, :] < lens
        return m[:, :, :-2:2][:, :, :-2:2]
    if input_layer == "conv2d":
        return mask[:, :, 2::2][:, :, 2::2]
    if input_layer == "conv2d6":
        return mask[:, :, 2::2][:, :, 4::3]
    if input_layer == "conv2d8":
        return mask[:, :, 2::2][:, :, 2::2][:, :, 2::2]
    if input_layer == "stack2":
        t = mask.shape[-1]
        return mask[:, :, 1::2][:, :, : t // 2]
    raise ValueError(input_layer)
