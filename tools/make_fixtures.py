#!/usr/bin/env python
"""Generate the bundled test fixtures (the example1.pt / example2.pt roles of
the reference notebooks, SURVEY §4.1, as .npz):

- fixtures/example1.npz — a collated 16-utterance synthetic batch
  {utt_ids, waves, wave_lens, texts, text_lens};
- fixtures/example2.npz — CTC log-probs + lens from a seeded untrained
  CTCModel over that batch (greedy-decode/CER exercise material).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(out_dir="fixtures"):
    import jax

    from tpuasr.audio import fbank_batch
    from tpuasr.config import CTCModelConfig, FeatureConfig
    from tpuasr.data.pipeline import BatchSpec, make_batch
    from tpuasr.data.synthetic import synth_corpus
    from tpuasr.models import CTCModel

    os.makedirs(out_dir, exist_ok=True)
    utts = synth_corpus(16, 40, seed=1234, min_tokens=3, max_tokens=6,
                        samples_per_token=24 * 512, add_sos_eos=True)
    batch = make_batch(utts, BatchSpec(16, 256 * 512, 8))
    np.savez_compressed(
        os.path.join(out_dir, "example1.npz"),
        utt_ids=np.array(batch["utt_ids"]),
        waves=batch["waves"].astype(np.float16),  # compact storage
        wave_lens=batch["wave_lens"],
        texts=batch["texts"],
        text_lens=batch["text_lens"],
    )

    cfg = CTCModelConfig(hidden_dim=32, attention_heads=2, num_blocks=2, kernel_size=7)
    model = CTCModel(cfg, 40, 5)
    feats, feat_lens = fbank_batch(
        batch["waves"].astype(np.float32), batch["wave_lens"],
        FeatureConfig(sample_rate=16000, use_pallas=False),
    )
    params = model.init(jax.random.PRNGKey(1234), np.asarray(feats), np.asarray(feat_lens),
                        batch["texts"], batch["text_lens"])
    lp, out_lens, _ = model.apply(params, np.asarray(feats), np.asarray(feat_lens))
    np.savez_compressed(
        os.path.join(out_dir, "example2.npz"),
        log_probs=np.asarray(lp, np.float16),
        lens=np.asarray(out_lens),
    )
    print(f"wrote {out_dir}/example1.npz and example2.npz")


if __name__ == "__main__":
    main()
