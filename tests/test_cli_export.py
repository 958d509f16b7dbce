"""CLI smoke: tools/export_stream.py exports and round-trip-verifies the
streaming StableHLO artifacts end to end in a subprocess (the serving-export
entry point; the library surface is covered by tests/test_export.py)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_export_stream_cli(tmp_path):
    out_dir = str(tmp_path / "artifacts")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["TPUASR_COMPILE_CACHE"] = "off"
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "export_stream.py"),
        "--out", out_dir, "--verify", "--max_tokens", "8", "--set",
        "model.encoder.num_blocks=1", "model.encoder.output_size=32",
        "model.encoder.attention_heads=2", "model.encoder.linear_units=64",
        "model.encoder.cnn_module_kernel=3", "model.encoder.causal=true",
        "model.encoder.static_chunk_size=4", "streaming.chunk_size=4",
        "model.predictor.embed_size=16", "model.predictor.hidden_size=16",
        "model.predictor.output_size=32",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=900)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "verify: process_chunk artifact executed one chunk ok" in proc.stdout
    manifest = json.load(open(os.path.join(out_dir, "manifest.json")))
    assert set(manifest["functions"]) == {
        "encoder_chunk", "predictor_step", "joint_step", "process_chunk",
    }
    for info in manifest["functions"].values():
        assert os.path.getsize(os.path.join(out_dir, info["file"])) > 0
