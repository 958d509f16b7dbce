"""Worker script for the multi-process jax.distributed CPU simulation test.

Launched as: python multiproc_worker.py <coordinator> <num_procs> <pid>

Each process owns 4 virtual CPU devices (8 global over 2 processes), loads
its own per-host shard of a deterministic synthetic corpus, assembles the
global batch with `jax.make_array_from_process_local_data`, runs two steps
of the full sharded train step on the global mesh, and allreduces CER
counts — the true multi-host story the reference only gestures at via
torchrun env vars + monitored_barrier (train_utils.py:252-270, 640-666).

Prints machine-checkable lines the parent test asserts on.
"""

import os
import sys

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num_procs, process_id=pid
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpuasr.config import Config, EncoderConfig, ModelConfig, PredictorConfig  # noqa: E402
from tpuasr.data.pipeline import BatchSpec, device_view, make_batch  # noqa: E402
from tpuasr.data.synthetic import synth_corpus  # noqa: E402
from tpuasr.eval.multihost import allreduce_cer_counts  # noqa: E402
from tpuasr.models import Transducer  # noqa: E402
from tpuasr.parallel import make_mesh  # noqa: E402
from tpuasr.text.cer import CerCounts  # noqa: E402
from tpuasr.train import TrainState, make_optimizer, make_train_step  # noqa: E402

assert jax.process_count() == num_procs, jax.process_count()
assert len(jax.devices()) == num_procs * 4, len(jax.devices())

cfg = Config()
cfg.model = ModelConfig(
    vocab_size=64, blank_id=5,
    encoder=EncoderConfig(
        output_size=32, attention_heads=2, linear_units=64, num_blocks=2,
        cnn_module_kernel=7, dropout_rate=0.0, positional_dropout_rate=0.0,
        causal=True, use_dynamic_chunk=True, static_chunk_size=4,
    ),
    predictor=PredictorConfig(embed_size=16, hidden_size=16, output_size=32),
)
cfg.feature.sample_rate = 16000

model = Transducer(cfg.model)
global_b = 8
local_b = global_b // num_procs

# per-host shard: host h takes utterances with index % num_hosts == h
# (pipeline.py's deterministic rule) of the same global synthetic corpus
utts = synth_corpus(global_b, cfg.model.vocab_size, seed=0, min_tokens=2,
                    max_tokens=3, samples_per_token=4096)
local_utts = [u for i, u in enumerate(utts) if i % num_procs == pid]
local = device_view(make_batch(local_utts, BatchSpec(local_b, 24 * 512, 6)))

mesh = make_mesh(jax.devices())
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

batch_sh = NamedSharding(mesh, P("data"))
repl_sh = NamedSharding(mesh, P())
batch = {}
for k, v in local.items():
    v = np.asarray(v)
    global_shape = (global_b,) + v.shape[1:]
    batch[k] = jax.make_array_from_process_local_data(batch_sh, v, global_shape)

feats_t = 1 + (24 * 512) // cfg.feature.hop_length
params = model.init(
    jax.random.PRNGKey(0),
    np.zeros((global_b, feats_t, 80), np.float32),
    np.full((global_b,), feats_t, np.int32),
    np.zeros((global_b, 6), np.int32),
    np.full((global_b,), 2, np.int32),
)
tx = make_optimizer(cfg.optim)
state = TrainState.create(params, tx)
state = jax.device_put(state, repl_sh)
step = make_train_step(model, tx, cfg, donate=False)

with jax.set_mesh(mesh):
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        print(f"P{pid} step{i} loss={float(metrics['loss']):.6f}", flush=True)

# cross-host CER count aggregation: each host contributes distinct counts
local_counts = CerCounts(substitutions=pid + 1, deletions=2 * (pid + 1),
                         insertions=0, ref_len=10 * (pid + 1))
total = allreduce_cer_counts(local_counts)
print(f"P{pid} cer S={total.substitutions} D={total.deletions} "
      f"I={total.insertions} N={total.ref_len}", flush=True)
print(f"P{pid} DONE", flush=True)
