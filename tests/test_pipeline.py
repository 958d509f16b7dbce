"""Input pipeline tests: bucket assignment, static shapes, per-host sharding
determinism, and batch construction."""

import numpy as np

from tpuasr.data.pipeline import BatchSpec, LengthBucketPipeline, Utterance, device_view, make_batch


def _utts(n, rng, min_len=1000, max_len=9000):
    out = []
    for i in range(n):
        ln = int(rng.integers(min_len, max_len))
        ntok = int(rng.integers(2, 9))
        out.append(Utterance.from_arrays(
            f"u{i:04d}", rng.standard_normal(ln).astype(np.float32),
            rng.integers(1, 50, ntok).tolist(),
        ))
    return out


def _pipe(utts, bs=4, hosts=(0, 1)):
    return LengthBucketPipeline(
        utts, batch_size=bs, frame_buckets=(8, 12, 16, 20), token_buckets=(4, 8, 12),
        hop_length=512, seed=7, host_id=hosts[0], num_hosts=hosts[1],
    )


def test_static_shapes_and_padding(rng):
    utts = _utts(32, rng)
    pipe = _pipe(utts, hosts=(0, 1))
    seen_shapes = set()
    total = 0
    for batch in pipe.batches(0):
        b, n = batch["waves"].shape
        assert b == 4
        # wave bucket boundaries: (fb - 1) * hop
        assert n in {(fb - 1) * 512 for fb in (8, 12, 16, 20)}
        assert batch["texts"].shape[1] in (4, 8, 12)
        for i in range(int(batch["num_valid"])):
            ln = int(batch["wave_lens"][i])
            assert ln <= n
            assert np.all(batch["waves"][i, ln:] == 0)
        seen_shapes.add((n, batch["texts"].shape[1]))
        total += int(batch["num_valid"])
    assert total == 32
    assert len(seen_shapes) <= 4 * 3  # bounded compile count


def test_epoch_shuffling_changes_order(rng):
    utts = _utts(24, rng)
    pipe = _pipe(utts)
    ids0 = [tuple(b["utt_ids"]) for b in pipe.batches(0)]
    ids1 = [tuple(b["utt_ids"]) for b in pipe.batches(1)]
    assert ids0 != ids1
    # same epoch twice is deterministic
    assert ids0 == [tuple(b["utt_ids"]) for b in pipe.batches(0)]


def test_per_host_sharding_partitions(rng):
    utts = _utts(20, rng)
    got = set()
    for host in range(2):
        pipe = _pipe(utts, hosts=(host, 2))
        for batch in pipe.batches(0):
            for i in range(int(batch["num_valid"])):
                utt = batch["utt_ids"][i]
                assert utt not in got  # disjoint across hosts
                got.add(utt)
    assert len(got) == 20


def test_device_view_strips_host_fields(rng):
    utts = _utts(4, rng)
    batch = make_batch(utts, BatchSpec(4, 8000, 12))
    dv = device_view(batch)
    assert set(dv) == {"waves", "wave_lens", "texts", "text_lens"}


def test_overlong_utterances_skipped(rng):
    utts = _utts(4, rng, min_len=50000, max_len=60000)  # beyond all buckets
    pipe = _pipe(utts)
    batches = list(pipe.batches(0))
    assert batches == []
    assert pipe.last_skipped == 4
