#!/usr/bin/env python
"""Download a prebuilt ggml .bin model (the reference's
models/download-ggml.py equivalent: fetches from the HF `skeskinen/ggml`
repo of converted bert.cpp models).

The engine loads these directly: `load_model("ggml-model-q4_0.bin")` —
vocab is embedded in the file.

Usage:
  python tools/download_ggml.py all-MiniLM-L6-v2 q4_0 [dest_dir]

Requires network access; offline, convert a local HF checkout instead:
  python -m embeddings_tpu.cli convert <hf_dir> model.bin --dtype q4_0
"""

import sys
from pathlib import Path

REPO = "skeskinen/ggml"
MODELS = ["all-MiniLM-L6-v2", "all-MiniLM-L12-v2", "bert-base-uncased",
          "multi-qa-MiniLM-L6-cos-v1", "paraphrase-multilingual-MiniLM-L12-v2"]
DTYPES = ["f32", "f16", "q4_0", "q4_1"]


def main() -> int:
    if len(sys.argv) < 3 or sys.argv[1] not in MODELS or \
            sys.argv[2] not in DTYPES:
        print(__doc__)
        print(f"models: {', '.join(MODELS)}\ndtypes: {', '.join(DTYPES)}")
        return 1
    model, dtype = sys.argv[1], sys.argv[2]
    dest = Path(sys.argv[3] if len(sys.argv) > 3 else f"models/{model}")
    dest.mkdir(parents=True, exist_ok=True)
    try:
        from huggingface_hub import hf_hub_download
    except ImportError:
        print("huggingface_hub not installed", file=sys.stderr)
        return 1
    path = hf_hub_download(
        repo_id=REPO, filename=f"{model}/ggml-model-{dtype}.bin",
        local_dir=dest)
    # the repo filename includes the model subdir, so hf nests it at
    # dest/{model}/...; move it up to the documented layout
    import shutil
    final = dest / f"ggml-model-{dtype}.bin"
    if Path(path).resolve() != final.resolve():
        shutil.move(path, final)
        nested = dest / model
        if nested.is_dir() and not any(nested.iterdir()):
            nested.rmdir()
    print(f"downloaded to {final}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
