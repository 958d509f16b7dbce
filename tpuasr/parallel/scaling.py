"""Multi-host scaling prediction from compiled HLO collectives.

BASELINE.md's north star asks for ≥80% scaling efficiency at N ≥ 2 hosts;
real multi-host hardware is not available here, so the prediction is made
the way a TPU performance engineer would on paper (the scaling-book recipe):

1. compile the REAL sharded train step over an (hosts × chips) virtual
   device mesh (SPMD partitioning inserts the same collectives XLA would
   emit on a pod),
2. walk the optimized HLO for collective ops and their per-device payload
   bytes + replica groups,
3. cost each collective with the standard ring/hierarchical model over the
   link it rides — ICI for groups inside one host, NIC/DCN for groups that
   cross hosts (per-chip device ids are mapped to hosts as id // chips),
4. predicted step time = compute ⊕ exposed communication, reported both
   with zero overlap (pessimistic) and full overlap (XLA async collectives
   behind the backward pass — the realistic bound).

Bandwidth constants default to the public v5e numbers (ICI ~4.5e10 B/s per
link one-way, DCN ~2.5e10 B/s per host NIC) and are overridable — the
*bytes* are measured from the compiled program, only the link speeds are
assumptions.

Reference counterpart: the torch DDP/DeepSpeed path
(wenet/utils/train_utils.py:410-488) ships the same gradient volume through
NCCL; it publishes no scaling numbers, so this model is the quantitative
side of SURVEY §2.8's "XLA collectives over ICI" equivalence claim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
    "c64": 8, "c128": 16,
}

_OP_RE = re.compile(
    r"=\s*(?P<result>\([^)]*\)|\S+)\s+"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?P<start>-start)?\(",
)
_SHAPE_RE = re.compile(r"(?P<dt>[a-z]+\d*)\[(?P<dims>[\d,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{(?P<groups>[^}]*(?:\},\{[^}]*)*)\}\}")
_GROUPS_FLAT_RE = re.compile(r"replica_groups=\{\{(?P<body>.*?)\}\}")
_IOTA_RE = re.compile(
    r"replica_groups=\[(?P<ng>\d+),(?P<gs>\d+)\]<=\[(?P<dims>[\d,]+)\]"
    r"(?:T\((?P<perm>[\d,]+)\))?"
)
_PAIRS_RE = re.compile(r"source_target_pairs=\{(?P<body>.*?)\}")


@dataclass
class Collective:
    op: str  # all-reduce | all-gather | reduce-scatter | ...
    payload: int  # per-device result bytes (the partitioned tensor)
    groups: list  # list of device-id lists


@dataclass
class CommReport:
    """Per-step communication, split by link class."""

    ici_bytes: float = 0.0  # per-chip bytes over in-host ICI
    dcn_bytes: float = 0.0  # per-host bytes over the host NIC
    by_op: dict = field(default_factory=dict)


def _shape_bytes(result: str) -> int:
    total = 0
    for m in _SHAPE_RE.finditer(result):
        dims = [int(d) for d in m.group("dims").split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        total += n * _DTYPE_BYTES.get(m.group("dt"), 4)
    return total


def _parse_groups(line: str, n_devices: int) -> list:
    m = _GROUPS_FLAT_RE.search(line)
    if m:
        return [
            [int(x) for x in g.split(",") if x.strip()]
            for g in m.group("body").split("},{")
        ]
    m = _IOTA_RE.search(line)
    if m:
        dims = [int(d) for d in m.group("dims").split(",")]
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group("perm"):
            ids = ids.transpose([int(p) for p in m.group("perm").split(",")])
        return ids.reshape(int(m.group("ng")), int(m.group("gs"))).tolist()
    m = _PAIRS_RE.search(line)
    if m:  # collective-permute pairs
        pairs = re.findall(r"\{(\d+),(\d+)\}", m.group("body"))
        return [[int(a), int(b)] for a, b in pairs]
    # no groups attribute: all devices participate
    return [list(range(n_devices))]


def parse_collectives(hlo_text: str, n_devices: int) -> list[Collective]:
    out = []
    for line in hlo_text.splitlines():
        m = _OP_RE.search(line)
        if m is None:
            continue
        out.append(Collective(
            op=m.group("op"),
            payload=_shape_bytes(m.group("result")),
            groups=_parse_groups(line, n_devices),
        ))
    return out


def comm_report(
    colls: list[Collective], chips_per_host: int, n_hosts: int,
) -> CommReport:
    """Ring/hierarchical wire-byte model of one step's collectives.

    Payloads are per-device (SPMD-partitioned shapes). For a group of
    g = h·c devices spanning h hosts:
      all-reduce   -> ICI 2(c-1)/c·p per chip, DCN 2(h-1)/h·p per host
                      (in-host reduce-scatter/all-gather + cross-host
                      all-reduce of the 1/c shards, summed over c chips)
      all-gather   -> ICI (c-1)/c·p, DCN (h-1)/h·p   (p = gathered bytes)
      reduce-scatter -> mirror of all-gather with p = input bytes = g·result
      collective-permute -> p on whichever link the pair crosses
      all-to-all   -> (g-1)/g·p split proportionally to in/cross-host peers
    """
    rep = CommReport()
    for c in colls:
        if not c.groups or not c.groups[0]:
            continue  # e.g. degenerate replica_groups={} single-participant
        # groups partition the devices and run concurrently on disjoint
        # links — one (representative) group's cost IS the per-chip cost
        grp = c.groups[0]
        hosts = {d // chips_per_host for d in grp}
        h = len(hosts)
        g = len(grp)
        cc = max(1, g // h)
        p = float(c.payload)
        ici = dcn = 0.0
        if c.op == "all-reduce":
            ici = 2.0 * (cc - 1) / cc * p
            dcn = 2.0 * (h - 1) / h * p
        elif c.op == "all-gather":
            ici = (cc - 1) / cc * p
            dcn = (h - 1) / h * p
        elif c.op == "reduce-scatter":
            pin = p * g
            ici = (cc - 1) / cc * pin / max(h, 1)
            dcn = (h - 1) / h * pin / max(cc, 1)
        elif c.op == "collective-permute":
            if h > 1:
                dcn = p
            else:
                ici = p
        elif c.op == "all-to-all":
            ici = (cc - 1) / g * p
            dcn = (g - cc) / g * p
        if h == 1:
            dcn = 0.0
        rep.by_op.setdefault(c.op, [0.0, 0.0])
        rep.by_op[c.op][0] += ici
        rep.by_op[c.op][1] += dcn
    for op, (ici, dcn) in rep.by_op.items():
        rep.ici_bytes += ici
        rep.dcn_bytes += dcn
    return rep


def rescale_for_hosts(
    colls: list[Collective], chips_per_host: int,
    compiled_hosts: int, target_hosts: int,
) -> list[Collective]:
    """Extrapolate the compiled mesh's collectives to a different host count.

    Weak scaling on the data axis: per-device payloads are host-count
    invariant (gradients: param-shaped; ZeRO shards grow as 1/N — modeled by
    keeping the COMPILED payloads, conservative for N > compiled). Groups
    that span all compiled hosts are assumed to span all target hosts."""
    out = []
    for c in colls:
        new_groups = []
        for grp in c.groups:
            hosts = {d // chips_per_host for d in grp}
            if len(hosts) == compiled_hosts and compiled_hosts > 1:
                # stretch the group's host span to target_hosts, keeping the
                # same chips-per-host membership (ids only matter via //chips)
                cc = max(1, len(grp) // len(hosts))
                new_groups.append([
                    h * chips_per_host + (d % chips_per_host)
                    for h in range(target_hosts) for d in grp[:cc]
                ])
            else:
                new_groups.append(grp)
        out.append(Collective(c.op, c.payload, new_groups))
    return out


def predict(
    colls: list[Collective],
    chips_per_host: int,
    n_hosts: int,
    compute_ms: float,
    ici_gbps: float = 45.0,  # GB/s per chip one-way (v5e public figure)
    dcn_gbps: float = 25.0,  # GB/s per host NIC (200 Gbps)
) -> dict:
    rep = comm_report(colls, chips_per_host, n_hosts)
    t_ici = rep.ici_bytes / (ici_gbps * 1e9) * 1e3
    t_dcn = rep.dcn_bytes / (dcn_gbps * 1e9) * 1e3
    no_overlap = compute_ms / (compute_ms + t_ici + t_dcn)
    full_overlap = compute_ms / max(compute_ms, t_ici + t_dcn)
    return {
        "hosts": n_hosts,
        "chips_per_host": chips_per_host,
        "ici_mb": rep.ici_bytes / 1e6,
        "dcn_mb": rep.dcn_bytes / 1e6,
        "t_compute_ms": compute_ms,
        "t_ici_ms": t_ici,
        "t_dcn_ms": t_dcn,
        "eff_no_overlap": no_overlap,
        "eff_full_overlap": full_overlap,
        "by_op": {k: (v[0] / 1e6, v[1] / 1e6) for k, v in rep.by_op.items()},
    }
