"""Offline xplane-trace aggregation for this environment (no TensorBoard).

Parses a `jax.profiler` trace (`vm.xplane.pb`) with the pure-python
protobuf impl (CLAUDE.md recipe) and prints per-op total/mean durations
from the device plane's synchronous **'XLA Ops'** line only — the other
lines double-count ('XLA Modules' is the dispatch envelope, 'Async XLA
Ops' holds overlapped prefetch copies whose duration is hidden behind
compute, 'Steps' wraps everything). Control-flow envelope events
(%while/%conditional/%call), which enclose their body ops on the same
line, are skipped so totals are non-overlapping.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
         python experiments/r4/parse_xplane.py <trace.xplane.pb> \
             [topN] [steps]
With `steps` given, also prints per-step ms for each family.
"""

import collections
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def family(name: str) -> str:
    n = name.lower()
    if "fused_backward" in n:
        return "fused ray-march bwd (custom-call + grad transposes)"
    if "fused_forward" in n:
        return "fused ray-march fwd (custom-call)"
    if "copy" in n or "transpose" in n and "jvp" not in n:
        return "copies/transposes"
    if "fusion" in n:
        return "XLA fusions (sampling/occupancy/Adam glue)"
    if "sort" in n:
        return "sort (fine union)"
    if "dot" in n or "convolution" in n:
        return "plain matmuls"
    if "dynamic" in n or "gather" in n or "scatter" in n:
        return "gather/scatter"
    if "rng" in n or "bitcast" in n:
        return "rng/bitcast"
    return "other"


ENVELOPES = ("%while", "%conditional", "%call")


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else None
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        print(f"=== plane: {plane.name} (line 'XLA Ops' only)")
        by_op = collections.Counter()
        counts = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                if meta.name.startswith(ENVELOPES):
                    continue
                by_op[meta.name] += ev.duration_ps
                counts[meta.name] += 1
        total = sum(by_op.values())
        if not total:
            continue
        print(f"total op time: {total / 1e9:.3f} ms"
              + (f"  ({total / 1e9 / steps:.3f} ms/step)" if steps else ""))
        fam = collections.Counter()
        for name, ps in by_op.items():
            fam[family(name)] += ps
        print("-- by family (ms total | ms/step | % of op time)")
        for name, ps in fam.most_common():
            per = f"{ps / 1e9 / steps:8.3f}" if steps else "        "
            print(f"{ps / 1e9:10.3f} | {per} | {100 * ps / total:5.1f}%  {name}")
        print(f"-- top {top_n} ops (total ms | n | mean us)")
        for name, ps in by_op.most_common(top_n):
            n = counts[name]
            print(
                f"{ps / 1e9:10.3f} | {n:6d} | {ps / n / 1e6:9.2f}  "
                f"{name[:110]}"
            )


if __name__ == "__main__":
    main()
