"""Offline xplane-trace aggregation for this environment (no TensorBoard).

Parses a `jax.profiler` trace (`vm.xplane.pb`) with the pure-python
protobuf impl (CLAUDE.md recipe) and prints per-op total/mean durations on
the device planes, grouped by a coarse kernel family so a step budget can
be read off directly.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python experiments/r4/parse_xplane.py <trace.xplane.pb> [topN]
"""

import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def family(name: str) -> str:
    n = name.lower()
    if "fused_raymarch" in n or "raymarch" in n:
        if "bwd" in n or "vjp" in n or "transpose" in n or "grad" in n:
            return "fused ray-march bwd"
        return "fused ray-march fwd"
    if "occupancy" in n or "occ_" in n:
        return "occupancy"
    if "sort" in n:
        return "sort (fine union)"
    if "while" in n:
        return "while-loops"
    if "fusion" in n:
        return "XLA fusions (glue)"
    if "copy" in n or "transpose" in n:
        return "copies/transposes"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/scatter"
    if "dot" in n or "conv" in n:
        return "plain matmuls"
    return "other"


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        print(f"=== plane: {plane.name}")
        by_op = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            # XLA op lines carry the compiled program breakdown; step lines
            # and "Steps" metadata are skipped via the per-line name check.
            if line.name.lower() in ("steps", "step"):
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                by_op[meta.name] += ev.duration_ps
                counts[meta.name] += 1
        total = sum(by_op.values())
        if not total:
            continue
        print(f"total device time: {total / 1e9:.3f} ms")
        fam = collections.Counter()
        for name, ps in by_op.items():
            fam[family(name)] += ps
        print("-- by family (ms, % of device time)")
        for name, ps in fam.most_common():
            print(f"{ps / 1e9:10.3f}  {100 * ps / total:5.1f}%  {name}")
        print(f"-- top {top_n} ops (total ms | n | mean us)")
        for name, ps in by_op.most_common(top_n):
            n = counts[name]
            print(
                f"{ps / 1e9:10.3f} | {n:6d} | {ps / n / 1e6:9.2f}  "
                f"{name[:110]}"
            )


if __name__ == "__main__":
    main()
