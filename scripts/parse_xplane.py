#!/usr/bin/env python
"""Roll up a JAX profiler capture into a per-step device-time table.

Parses the ``*.xplane.pb`` written by ``train.py --profile_steps N`` (or
``jax.profiler.trace``) WITHOUT TensorBoard: reads the ``/device:TPU:*``
plane's "XLA Ops" line and aggregates op durations by HLO opcode, so the
"where do the milliseconds go" question (fusions vs MXU matmuls vs layout
copies vs convs) is one command instead of a notebook. This is the tool
that produced the README's round-3 device-profile table.

The reference's only profiling story is fvcore FLOP counting
(``Models/Transformer/mpvit.py:819-827``); this is the device-time
counterpart for the TPU rebuild.

Usage:
    python scripts/parse_xplane.py <profile_dir_or_xplane.pb> \
        [--steps N] [--top K]

``--steps`` divides totals into per-step numbers (use the step count you
profiled); ``--top`` also prints the K most expensive individual ops.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

# the pure-python protobuf runtime tolerates the tensorflow/tsl proto
# descriptors shipped in this image; the upb runtime can reject them
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
    )
    if not hits:
        sys.exit(f"no *.xplane.pb under {path}")
    return hits[-1]


# the opcode is the first space-preceded word directly followed by ``(``:
# result types (incl. parenthesised tuples) never contain ``<space>word(``
# — layout annotations like ``T(8,128)`` follow ``:`` or ``)`` unspaced
_OPCODE_RE = re.compile(r"\s([\w.-]+)\(")


def opcode_of(hlo: str) -> str:
    """``'%fusion.16 = u32[262144,16]{1,0} fusion(...), kind=kCustom'``
    → ``'fusion'`` (with the kCustom kind appended when present)."""
    m = _OPCODE_RE.search(hlo)
    op = m.group(1) if m else hlo.split(".")[0].lstrip("%")
    kind = re.search(r"kind=(\w+)", hlo)
    if op == "fusion" and kind:
        return f"fusion[{kind.group(1)}]"
    if op == "custom-call":
        tgt = re.search(r'custom_call_target="([^"]+)"', hlo)
        if tgt:
            return f"custom-call[{tgt.group(1)}]"
    return op


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("path", help="profile dir (searched recursively) or "
                                 "a .xplane.pb file")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of profiled steps (divides totals)")
    ap.add_argument("--top", type=int, default=0,
                    help="also print the K most expensive individual ops")
    ap.add_argument("--hlo", action="store_true",
                    help="with --top: print each op's full HLO expression "
                         "(result shape + operands) instead of just its name")
    args = ap.parse_args()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    f = find_xplane(args.path)
    xs = xplane_pb2.XSpace()
    with open(f, "rb") as fh:
        xs.ParseFromString(fh.read())

    device_planes = [p for p in xs.planes
                     if "/device:" in p.name and "CPU" not in p.name]
    if not device_planes:
        sys.exit(f"no device plane in {f}; planes: "
                 f"{[p.name for p in xs.planes]}")

    for plane in device_planes:
        lines = [l for l in plane.lines if l.name == "XLA Ops"]
        if not lines:
            continue
        md = plane.event_metadata
        by_cat: collections.Counter = collections.Counter()
        by_op: collections.Counter = collections.Counter()
        n_events: collections.Counter = collections.Counter()
        total_ps = 0
        for line in lines:
            for e in line.events:
                name = md[e.metadata_id].name
                dur = e.duration_ps
                total_ps += dur
                by_cat[opcode_of(name)] += dur
                if args.top:
                    key = name if args.hlo else name.split(" = ")[0]
                    by_op[key] += dur
                    n_events[key] += 1

        ms = 1e-9  # ps → ms
        per_step = args.steps
        print(f"== {plane.name} ({f})")
        print(f"device busy: {total_ps * ms:.2f} ms total, "
              f"{total_ps * ms / per_step:.2f} ms/step over {per_step} steps")
        print(f"{'category':<40} {'ms/step':>9} {'%':>6}")
        for cat, ps in by_cat.most_common():
            print(f"{cat:<40} {ps * ms / per_step:9.2f} "
                  f"{100 * ps / total_ps:6.1f}")
        if args.top:
            print(f"\ntop {args.top} ops:")
            width = 600 if args.hlo else 90
            for op, ps in by_op.most_common(args.top):
                print(f"  {ps * ms / per_step:8.2f} ms/step  "
                      f"x{n_events[op] // per_step:<4} {op[:width]}")


if __name__ == "__main__":
    main()
