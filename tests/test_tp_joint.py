"""TP joint-sharding proof (VERDICT r3 weak#5; SURVEY §2.7 TP row).

Two gates over tools/tp_joint_bench.py's machinery on the 8-device mesh:

- memory: at the north-star shape (B8 T512 U128 V4096 — BASELINE.json "when
  T*U*V exceeds HBM"), the compiled unsharded joint+loss+grad program needs
  more temp memory than a 16 GB HBM device, and the dp x tp sharded program's
  per-device temp is several times smaller (the joint rides the `model` axis);
- execution: at a small shape, dp x tp loss and grads equal single-device.
"""

import sys

sys.path.insert(0, ".")

import pytest

HBM_BYTES = 16 * 1024**3  # v5e-class chip


@pytest.mark.slow
def test_tp_joint_memory_northstar():
    from tools.tp_joint_bench import analyze

    res = analyze(8, 512, 128, 4096, 256, "float32", tp=4)
    assert res["analytic_logits_bytes"] > 8 * 1024**3
    assert res["unsharded_temp_bytes"] > HBM_BYTES, res
    per_dev = res["sharded_temp_bytes_per_device"]
    assert per_dev < HBM_BYTES / 2, res
    assert res["unsharded_temp_bytes"] / per_dev > 3.0, res


def test_tp_joint_execution_parity():
    from tools.tp_joint_bench import execution_parity

    loss = execution_parity(tp=4)
    assert loss > 0
