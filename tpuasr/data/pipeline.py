"""Host-side input pipeline: length-bucketed, static-shape batches.

The reference pads each batch to its max length (utils/utils.py:29-69), which
on TPU would trigger a recompile per unique shape. Here every batch is padded
to one of a small set of (wave_samples, tokens) buckets so the jitted train
step compiles once per bucket. Feature extraction happens on device inside the
train/eval step (tpuasr.audio.fbank), so the host only loads waveforms.

Per-host sharding for multi-host data parallelism: each host takes the
utterances with ``index % num_hosts == host_id`` (deterministic, so every host
agrees on steps-per-epoch — replacing the reference's monitored-barrier
straggler machinery, wenet/utils/train_utils.py:640-666).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, Sequence

import numpy as np


@dataclass(frozen=True)
class BatchSpec:
    """Static shape of one bucket: [B, wave_samples] audio + [B, tokens] text."""

    batch_size: int
    wave_samples: int
    tokens: int


@dataclass
class Utterance:
    utt_id: str
    wave: np.ndarray | None  # float32 [N]; None until loaded
    tokens: np.ndarray  # int32 [U]
    wave_len: int

    @staticmethod
    def from_arrays(utt_id: str, wave: np.ndarray, tokens: Sequence[int]) -> "Utterance":
        return Utterance(utt_id, np.asarray(wave, np.float32),
                         np.asarray(tokens, np.int32), len(wave))


def make_batch(utts: list[Utterance], spec: BatchSpec, pad_id: int = 0) -> dict:
    """Zero-pad audio, pad_id-pad text (collate_with_PAD parity with static shapes)."""
    b = spec.batch_size
    waves = np.zeros((b, spec.wave_samples), np.float32)
    wave_lens = np.zeros((b,), np.int32)
    texts = np.full((b, spec.tokens), pad_id, np.int32)
    text_lens = np.zeros((b,), np.int32)
    ids = []
    for i, u in enumerate(utts):
        n = min(u.wave_len, spec.wave_samples)
        waves[i, :n] = u.wave[:n]
        wave_lens[i] = n
        t = min(len(u.tokens), spec.tokens)
        texts[i, :t] = u.tokens[:t]
        text_lens[i] = t
        ids.append(u.utt_id)
    ids += [""] * (b - len(utts))
    return {
        "utt_ids": ids,
        "waves": waves,
        "wave_lens": wave_lens,
        "texts": texts,
        "text_lens": text_lens,
        # rows beyond len(utts) are padding-only (partial final batch)
        "num_valid": np.int32(len(utts)),
    }


DEVICE_KEYS = ("waves", "wave_lens", "texts", "text_lens")


def device_view(batch: dict) -> dict:
    """Array-only view of a batch (jit-safe: drops utt_ids and host metadata)."""
    return {k: batch[k] for k in DEVICE_KEYS if k in batch}


class LengthBucketPipeline:
    """Buckets utterances by (wave length, token count) and yields static-shape
    batches in shuffled order."""

    def __init__(
        self,
        utterances: Sequence,
        batch_size: int,
        frame_buckets: Sequence[int],
        token_buckets: Sequence[int],
        hop_length: int = 512,
        pad_id: int = 0,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        loader: Callable[[object], Utterance] | None = None,
        drop_remainder: bool = False,
    ):
        self._loader = loader or (lambda u: u)
        self._items = [u for i, u in enumerate(utterances) if i % num_hosts == host_id]
        self.batch_size = batch_size
        self.pad_id = pad_id
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.hop = hop_length
        # bucket boundaries in wave samples so 1 + n//hop == frame bucket
        self.wave_buckets = sorted((fb - 1) * hop_length for fb in frame_buckets)
        self.token_buckets = sorted(token_buckets)

    def _bucket_of(self, wave_len: int, n_tokens: int) -> tuple[int, int] | None:
        wb = next((w for w in self.wave_buckets if wave_len <= w), None)
        tb = next((t for t in self.token_buckets if n_tokens <= t), None)
        if wb is None or tb is None:
            return None  # over-long utterance: skipped (count via stats)
        return wb, tb

    def batches(self, epoch: int = 0) -> Iterator[dict]:
        rng = np.random.default_rng((self.seed, epoch))
        order = rng.permutation(len(self._items))
        pending: dict[tuple[int, int], list] = {}
        skipped = 0
        for idx in order:
            u = self._loader(self._items[idx])
            key = self._bucket_of(u.wave_len, len(u.tokens))
            if key is None:
                skipped += 1
                continue
            pending.setdefault(key, []).append(u)
            if len(pending[key]) == self.batch_size:
                yield self._emit(pending.pop(key), key)
        if not self.drop_remainder:
            for key, utts in sorted(pending.items()):
                if utts:
                    yield self._emit(utts, key)
        self.last_skipped = skipped

    def _emit(self, utts: list[Utterance], key: tuple[int, int]) -> dict:
        spec = BatchSpec(self.batch_size, key[0], key[1])
        return make_batch(utts, spec, self.pad_id)

    def steps_per_epoch(self, epoch: int = 0) -> int:
        return sum(1 for _ in self.batches(epoch))
