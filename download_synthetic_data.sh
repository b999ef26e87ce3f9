#!/bin/bash
# Download the NeRF Blender-synthetic dataset (lego etc.).
# Mirrors the reference's download_synthetic_data.sh surface; uses the
# official NeRF data mirror. Requires network access.
set -euo pipefail
SCENE="${1:-lego}"
mkdir -p data
echo "Fetching nerf_synthetic.zip (official NeRF release mirror)..."
if command -v gdown >/dev/null 2>&1; then
  gdown 18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG -O data/nerf_synthetic.zip
else
  echo "gdown not available; please download nerf_synthetic.zip from the"
  echo "official NeRF project page (https://www.matthewtancik.com/nerf)"
  echo "into ./data/nerf_synthetic.zip and re-run."
  exit 1
fi
unzip -q data/nerf_synthetic.zip "nerf_synthetic/${SCENE}/*" -d data/
echo "done: data/nerf_synthetic/${SCENE}"
