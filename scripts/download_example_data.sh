#!/usr/bin/env bash
# Fetch the standard example datasets (same sources the reference points at:
# the tiny_nerf teaching set and the nerf_synthetic/nerf_llff_data archives).
set -euo pipefail
mkdir -p data
cd data
echo "Fetching tiny_nerf example data..."
wget -nc http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/tiny_nerf_data.npz
echo "Fetching nerf_synthetic + nerf_llff_data (NeRF paper datasets)..."
echo "  see https://www.matthewtancik.com/nerf -> 'Data' for the official"
echo "  Google Drive folder containing nerf_synthetic.zip / nerf_llff_data.zip;"
echo "  unzip them here as data/nerf_synthetic and data/nerf_llff_data."
