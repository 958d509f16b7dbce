"""Epoch training loop.

The reusable driver behind the reference's three train scripts (run.py:72-181,
rnnt_train.py:89-221, online_rnnt_train.py — same skeleton): epoch loop with
per-step metrics, per-epoch dev-loss pass, ReduceLROnPlateau, periodic +
latest checkpointing, and NaN-skip accounting (the guard itself runs inside
the jitted step).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from tpuasr.config import Config
from tpuasr.data.prefetch import prefetch_to_device
from tpuasr.train.checkpoint import epoch_path, latest_path, save_checkpoint
from tpuasr.train.metrics import MetricsWriter, StepTimer
from tpuasr.train.optim import PlateauTracker
from tpuasr.utils.rng import root_key


def _host_rss_gb():
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024 ** 2
    except OSError:
        pass
    return None


@dataclass
class LoopResult:
    state: object
    train_losses: list
    dev_losses: list


def run_epoch(step_fn, state, batches: Iterable[dict], rng, writer: MetricsWriter,
              cfg: Config, timer: StepTimer, epoch: int, mesh=None, cv_hook=None):
    # step counted host-side so the loop stays async: materializing
    # state.step (or the loss) every iteration would force a device
    # round-trip per step, which on a tunneled chip caps throughput at the
    # link latency instead of the device step time. Losses stay as device
    # scalars until the epoch mean; only log points synchronize.
    losses = []
    step = int(state.step)
    put = None
    if mesh is not None:
        from tpuasr.parallel import shard_batch

        put = lambda db: shard_batch(db, mesh)
    # depth-N device prefetch: batch assembly + transfer overlap the running
    # step (the r04 campaign's 40x wall-vs-device gap was transfer-serialized)
    for audio_s, db in prefetch_to_device(
            batches, cfg.data.num_prefetch, put=put,
            wire_dtype=cfg.data.wire_dtype,
            sample_rate=cfg.feature.sample_rate):
        state, metrics = step_fn(state, db, rng)
        losses.append(metrics["loss"])
        timer.tick(audio_s)
        step += 1
        if cv_hook is not None and cfg.train.save_interval > 0 \
                and step % cfg.train.save_interval == 0:
            # step-interval CV + checkpoint inside the epoch
            # (wenet executor.py:93-116)
            cv_hook(state, epoch, step)
        if step % cfg.train.log_every == 0:
            writer.scalars(
                {k: v for k, v in metrics.items() if k.startswith("loss") or k == "grad_norm"},
                step, prefix="train/",
            )
            writer.scalar("train/steps_per_second", timer.steps_per_second, step)
            writer.scalar("train/audio_seconds_per_second", timer.audio_seconds_per_second, step)
            writer.log(
                f"epoch {epoch} step {step} loss {float(metrics['loss']):.4f} "
                f"({timer.audio_seconds_per_second:.1f} audio-s/s)"
            )
    # one batched device_get instead of a blocking RPC per step's scalar
    losses = [float(l) for l in jax.device_get(losses)]
    return state, float(np.mean(losses)) if losses else float("nan")


def run_eval(eval_fn, state, batches: Iterable[dict], rng, mesh=None,
             cfg: Config | None = None) -> float:
    put = None
    if mesh is not None:
        from tpuasr.parallel import shard_batch

        put = lambda db: shard_batch(db, mesh)
    # same wire format as training so dev features match train features
    wire = cfg.data.wire_dtype if cfg is not None else "float32"
    depth = cfg.data.num_prefetch if cfg is not None else 0
    sr = cfg.feature.sample_rate if cfg is not None else 48000
    losses, weights = [], []
    for _, db in prefetch_to_device(batches, depth, put=put, wire_dtype=wire,
                                    sample_rate=sr):
        out = eval_fn(state.params, db, rng)
        losses.append(float(out["loss"]))
        weights.append(db["waves"].shape[0])
    if not losses:
        return float("nan")
    return float(np.average(losses, weights=weights))


def train_loop(
    cfg: Config,
    model,
    state,
    train_pipeline,
    dev_pipeline=None,
    step_fn: Optional[Callable] = None,
    eval_fn: Optional[Callable] = None,
    mesh=None,
    epochs: Optional[int] = None,
    start_epoch: int = 0,
    plateau_init: Optional[dict] = None,
    restart_hook: Optional[Callable] = None,
) -> LoopResult:
    from tpuasr.train.optim import make_optimizer
    from tpuasr.train.step import make_eval_step, make_train_step

    if step_fn is None:
        tx = make_optimizer(cfg.optim)
        state_shardings = None
        zero = getattr(cfg.mesh, "zero_stage", "none")
        if mesh is not None and zero != "none":
            # ZeRO-1/3 state sharding over the data axis (fsdp_utils parity)
            from tpuasr.parallel import shard_train_state, train_state_shardings

            state_shardings = train_state_shardings(state, mesh, zero)
            state = shard_train_state(state, state_shardings)
        step_fn = make_train_step(
            model, tx, cfg, donate=cfg.train.donate,
            remat=getattr(cfg.model.encoder, 'gradient_checkpointing', False),
            state_shardings=state_shardings,
            # safe here: the prefetcher device_puts a FRESH batch per step
            # (never reused after the call). Note the tunnel client's
            # per-execute host leak is NOT fixed by donation (leak_probe:
            # immune to reuse/donation/GC) — that is handled by the int16
            # wire format (halves the leaked bytes) + the max_rss_gb
            # watchdog below; donation just frees device buffers earlier.
            donate_batch=cfg.train.donate_batch,
        )
    if eval_fn is None:
        eval_fn = make_eval_step(model, cfg)

    writer = MetricsWriter(
        cfg.train.log_dir,
        os.path.join(cfg.train.save_dir, "log.txt") if cfg.train.save_dir else None,
    )
    if jax.process_index() == 0 and cfg.train.save_dir:
        # reproducible-inference config snapshot (wenet train.yaml parity,
        # train_utils.py:352-357)
        os.makedirs(cfg.train.save_dir, exist_ok=True)
        from tpuasr.config import save_yaml

        save_yaml(cfg, os.path.join(cfg.train.save_dir, "train.yaml"))
    plateau = PlateauTracker(cfg.optim.plateau_factor, cfg.optim.plateau_patience)
    if plateau_init:
        # resume-by-restart (reference run.py:164-179 + wenet
        # scheduler.set_step parity): the plateau tracker's best/bad/scale
        # come back from the checkpoint info so a restored run keeps its
        # decayed LR instead of resetting to 1.0
        plateau.best = float(plateau_init.get("best", plateau.best))
        plateau.bad_epochs = int(plateau_init.get("bad_epochs", 0))
        plateau.scale = float(plateau_init.get("scale", 1.0))
    rng = root_key(cfg.train.seed, cfg.train.rng_impl)
    timer = StepTimer()
    train_losses, dev_losses = [], []

    cv_hook = None
    if cfg.train.save_interval > 0:
        def cv_hook(cur_state, epoch, step):
            # checkpoint regardless of CV availability (executor.py saves at
            # save_interval whether or not a cv set is configured)
            cv_loss = None
            if dev_pipeline is not None:
                cv_loss = run_eval(eval_fn, cur_state,
                                   dev_pipeline.batches(epoch), rng, mesh, cfg)
                writer.scalar("cv/loss", cv_loss, step)
                writer.log(f"epoch {epoch} step {step} cv_loss {cv_loss:.4f}")
            if jax.process_index() == 0 and cfg.train.save_dir:
                os.makedirs(cfg.train.save_dir, exist_ok=True)
                save_checkpoint(
                    os.path.join(cfg.train.save_dir, f"step_{step}"),
                    cur_state,
                    {"epoch": epoch, "step": step, "cv_loss": cv_loss},
                )

    n_epochs = epochs if epochs is not None else cfg.train.epochs
    for epoch in range(start_epoch, n_epochs):
        state, train_loss = run_epoch(
            step_fn, state, train_pipeline.batches(epoch), rng, writer, cfg, timer,
            epoch, mesh, cv_hook,
        )
        train_losses.append(train_loss)
        msg = f"epoch {epoch} train_loss {train_loss:.4f}"
        if dev_pipeline is not None:
            dev_loss = run_eval(eval_fn, state, dev_pipeline.batches(epoch), rng,
                                mesh, cfg)
            dev_losses.append(dev_loss)
            scale = plateau.update(dev_loss)
            state = state.replace(lr_scale=state.lr_scale * 0 + scale)
            writer.scalar("dev/loss", dev_loss, int(state.step))
            writer.scalar("train/learning_rate_scale", scale, int(state.step))
            msg += f" dev_loss {dev_loss:.4f} lr_scale {scale:.4f}"
        rss = _host_rss_gb()
        if rss is not None:
            # operational guard for the tunnel client's per-execute host
            # leak (docs/RESULTS.md "Host memory leak"): the campaign OOM
            # was invisible until the kernel killed it — surface RSS at
            # every epoch boundary so long runs can be sized/restarted.
            # Appended AFTER dev_loss/lr_scale (campaign_report.py's
            # boundary regex anchors on that prefix).
            msg += f" rss {rss:.1f}G"
        writer.log(msg)

        rss_trip = (restart_hook is not None and cfg.train.max_rss_gb > 0
                    and rss is not None and rss > cfg.train.max_rss_gb
                    and epoch + 1 < n_epochs)
        if jax.process_index() == 0 and cfg.train.save_dir:
            os.makedirs(cfg.train.save_dir, exist_ok=True)
            info = {
                "epoch": epoch,
                "step": int(state.step),
                "train_loss": train_loss,
                "dev_loss": dev_losses[-1] if dev_losses else None,
                "skipped": int(state.skipped),
                "plateau": {"best": plateau.best,
                            "bad_epochs": plateau.bad_epochs,
                            "scale": plateau.scale},
            }
            # "latest" every save_latest_every epochs (the device->host
            # state pull is ~18 s on the tunnel — see TrainConfig), always
            # at the final epoch, and always before a watchdog restart
            if ((epoch + 1) % max(cfg.train.save_latest_every, 1) == 0
                    or epoch + 1 == n_epochs or rss_trip):
                save_checkpoint(latest_path(cfg.train.save_dir), state, info)
            if (epoch + 1) % cfg.train.save_every_epochs == 0:
                save_checkpoint(epoch_path(cfg.train.save_dir, epoch), state, info)

        if (rss_trip and jax.process_index() == 0 and cfg.train.save_dir):
            # host-RSS watchdog (VERDICT r4 weak#7): the tunnel client leaks
            # host memory per execute; the r04 campaign was OOM-killed at
            # epoch 43 with only a log line as mitigation. The epoch
            # checkpoint above was just written and resume is exact
            # (epoch/step/plateau state all round-trip), so instead of
            # running into the kernel kill we exec-restart with a fresh
            # address space and continue.
            writer.log(
                f"epoch {epoch} rss {rss:.1f}G > train.max_rss_gb "
                f"{cfg.train.max_rss_gb:.1f}: checkpointed, restarting"
            )
            writer.close()
            restart_hook(epoch)
            # a test hook may return instead of exec'ing: stop cleanly
            return LoopResult(state, train_losses, dev_losses)

    writer.close()
    return LoopResult(state, train_losses, dev_losses)
