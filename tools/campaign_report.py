#!/usr/bin/env python
"""Summarize a training campaign's MetricsWriter log into a markdown report.

    python tools/campaign_report.py exp/campaign/log.txt [--every 1]

Parses the `epoch N train_loss X dev_loss Y lr_scale Z` boundary lines (plus
step lines for throughput) out of train/loop.py's log and emits the loss
curve as a markdown table with wall-clock per epoch, plateau-decay events,
and the throughput trajectory — the RESULTS.md artifact of the
reference-protocol campaign (run.py:29-181 role)."""

import argparse
import re
import sys
from datetime import datetime

BOUND = re.compile(
    r"\[([\d: -]+)\] epoch (\d+) train_loss ([\d.na]+)"
    r"(?: dev_loss ([\d.na]+) lr_scale ([\d.]+))?")
STEP = re.compile(
    r"\[([\d: -]+)\] epoch (\d+) step (\d+) loss ([\d.]+) \(([\d.]+) audio-s/s\)")


def parse(path):
    epochs, steps = [], []
    for line in open(path):
        m = BOUND.search(line)
        if m:
            t, e, tr, dv, sc = m.groups()
            epochs.append(dict(
                time=datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), epoch=int(e),
                train=float(tr), dev=float(dv) if dv else None,
                scale=float(sc) if sc else None))
            continue
        m = STEP.search(line)
        if m:
            t, e, s, l, a = m.groups()
            steps.append(dict(
                time=datetime.strptime(t, "%Y-%m-%d %H:%M:%S"),
                epoch=int(e), step=int(s), loss=float(l), audio_sps=float(a)))
    return epochs, steps


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("log", nargs="+", help="log.txt path(s), concatenated in order")
    ap.add_argument("--every", type=int, default=1, help="emit every Nth epoch row")
    args = ap.parse_args()

    epochs, steps = [], []
    for p in args.log:
        e, s = parse(p)
        epochs += e
        steps += s
    if not epochs:
        sys.exit("no epoch boundary lines found")

    # dedup resumed re-runs of the same epoch: keep the LAST occurrence
    # (resume-by-restart replays the checkpointed epoch, run.py:164-179)
    last = {}
    for e in epochs:
        last[e["epoch"]] = e
    rows = [last[k] for k in sorted(last)]

    print("| epoch | train_loss | dev_loss | lr_scale | wall (s) |")
    print("|---|---|---|---|---|")
    prev_t = None
    decays = []
    walls = [(b["time"] - a["time"]).total_seconds()
             for a, b in zip(rows, rows[1:])]
    median_wall = sorted(walls)[len(walls) // 2] if walls else 0
    for r in rows:
        wall = (r["time"] - prev_t).total_seconds() if prev_t else None
        prev_t = r["time"]
        # across a resume the delta spans downtime between runs (dedup keeps
        # the last occurrence), and out-of-order log files give negatives —
        # mark instead of reporting a bogus wall-clock
        if wall is not None and (wall < 0 or wall > 5 * max(median_wall, 1)):
            wall = None
        if r["scale"] is not None and decays and r["scale"] < decays[-1][1]:
            decays.append((r["epoch"], r["scale"]))
        elif r["scale"] is not None and not decays:
            decays.append((r["epoch"], r["scale"]))
        if r["epoch"] % args.every and r is not rows[-1]:
            continue
        dv = f'{r["dev"]:.4f}' if r["dev"] is not None else "-"
        sc = f'{r["scale"]:.4f}' if r["scale"] is not None else "-"
        w = f"{wall:.0f}" if wall is not None else "-"
        print(f'| {r["epoch"]} | {r["train"]:.4f} | {dv} | {sc} | {w} |')

    events = [f"epoch {e}: lr_scale -> {s:.4g}" for e, s in decays[1:]]
    if events:
        print("\nplateau decays: " + "; ".join(events))
    if steps:
        tail = [s["audio_sps"] for s in steps[-8:]]
        print(f"\nthroughput (cumulative audio-s/s, last windows): "
              f"{', '.join(f'{x:.1f}' for x in tail)}")
        span = (steps[-1]["time"] - steps[0]["time"]).total_seconds()
        print(f"logged span: {span/60:.1f} min over {len(last)} epochs, "
              f"final step {steps[-1]['step']}")


if __name__ == "__main__":
    main()
