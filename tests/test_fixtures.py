"""Bundled-fixture demo (BASELINE config[0]: CPU-runnable CTC greedy decode on
the example1 path): load fixtures, decode, compute CER."""

import os

import numpy as np
import pytest

from tpuasr.decode import ctc_greedy_decode
from tpuasr.text import Tokenizer, corpus_cer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = os.path.join(ROOT, "fixtures")


@pytest.mark.skipif(not os.path.exists(os.path.join(FIX, "example1.npz")),
                    reason="fixtures not generated")
def test_fixture_ctc_greedy_pipeline():
    ex1 = np.load(os.path.join(FIX, "example1.npz"))
    ex2 = np.load(os.path.join(FIX, "example2.npz"))
    assert ex1["waves"].shape[0] == 16
    lp = ex2["log_probs"].astype(np.float32)
    lens = ex2["lens"]
    toks, tok_lens = ctc_greedy_decode(lp, lens, blank_id=5)
    tok = Tokenizer(tokens=[f"syl{i}" for i in range(34)])
    pairs = []
    for i in range(16):
        ref = [t for t in ex1["texts"][i, : ex1["text_lens"][i]].tolist()
               if t not in (0, 1, 2, 3, 4, 5)]
        hyp = [t for t in np.asarray(toks[i, : int(tok_lens[i])]).tolist()
               if t not in (0, 1, 2, 3, 4, 5)]
        pairs.append((ref, hyp))
    counts = corpus_cer(pairs)
    assert counts.ref_len > 0  # untrained model: CER high, pipeline exercised
