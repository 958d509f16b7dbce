"""tpuasr — TPU-native streaming ASR framework (JAX / XLA / Pallas / pjit).

A from-scratch, TPU-first speech-recognition framework with the capabilities of
the CTC-VR reference project (CTC + RNN-Transducer Mandarin ASR):

- ``tpuasr.audio``    log-mel fbank feature extraction (jnp reference + Pallas MXU kernel)
- ``tpuasr.text``     tokenizers, pinyin vocab, CER metric
- ``tpuasr.data``     BZNSYP corpus readers, length-bucketed static-shape batching
- ``tpuasr.nn``       conformer encoder stack, subsampling, rel-pos attention, masks,
                      scan-LSTM predictor, joint network
- ``tpuasr.losses``   CTC and RNN-T lattice losses (jnp + custom-vjp)
- ``tpuasr.ops``      Pallas TPU kernels (fbank, CTC, RNN-T lattices)
- ``tpuasr.models``   CTCModel and Transducer (offline + streaming, one model)
- ``tpuasr.streaming``fixed-shape streaming caches + chunkwise drivers
- ``tpuasr.decode``   batched jit decoders (CTC greedy / prefix beam, RNN-T greedy / beam)
- ``tpuasr.train``    pjit train step, optimizers, schedules, checkpointing
- ``tpuasr.parallel`` device mesh + sharding rules
- ``tpuasr.eval``     CER evaluation, streaming eval, RTF/delay harness
"""

__version__ = "0.1.0"
