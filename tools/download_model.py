#!/usr/bin/env python
"""Download an HF model repo for conversion (the reference's
models/download-repo.py equivalent).

Usage: python tools/download_model.py sentence-transformers/all-MiniLM-L6-v2 [dest]

Requires network access; in an offline environment point the converter at
an existing local checkout instead.
"""

import sys
from pathlib import Path


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    repo = sys.argv[1]
    dest = Path(sys.argv[2] if len(sys.argv) > 2 else
                f"models/{repo.split('/')[-1]}")
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print("huggingface_hub not installed", file=sys.stderr)
        return 1
    path = snapshot_download(
        repo_id=repo, local_dir=dest,
        allow_patterns=["*.json", "*.txt", "*.safetensors",
                        "pytorch_model.bin"])
    print(f"downloaded to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
