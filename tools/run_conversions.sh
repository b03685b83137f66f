#!/usr/bin/env bash
# Convert an HF checkpoint dir to every dtype (the reference's
# models/run_conversions.sh equivalent: f32 + f16 + q4_0 + q4_1, plus q8_0).
# Usage: tools/run_conversions.sh models/all-MiniLM-L6-v2 [outdir]
set -euo pipefail
SRC="$1"
OUT="${2:-$SRC}"
NAME="$(basename "$SRC")"
for dt in f32 f16 q4_0 q4_1 q8_0; do
  python -m embeddings_tpu.cli convert "$SRC" "$OUT/$NAME-$dt.npz" --dtype "$dt"
done
# reference-format ggml .bin exports for drop-in / parity testing
for dt in f32 q4_0; do
  python -m embeddings_tpu.cli convert "$SRC" "$OUT/ggml-model-$dt.bin" --dtype "$dt"
done
