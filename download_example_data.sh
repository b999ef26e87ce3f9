#!/bin/bash
# Generate example data WITHOUT network access: a procedural analytic scene
# (the reference's script downloads tiny-nerf example data; this framework
# can synthesize its own ground truth — see minimal_nerf_tpu/data/procedural.py).
set -euo pipefail
OUT="${1:-./dev_data}"
SIZE="${2:-100}"
python -m minimal_nerf_tpu.data.procedural --out "$OUT" --size "$SIZE"
