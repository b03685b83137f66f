#!/usr/bin/env python
"""Generate golden tokenizer fixtures with HuggingFace (the reference's
examples/test_hf_tokenizer.py flow: AutoTokenizer over test_prompts.txt ->
hf_tokenized_ids.txt, consumed by its test_tokenizer binary).

Our pytest suite builds the HF oracle in-process (tests/conftest.py), so
this script exists for parity with the reference's file-based workflow and
for checking OUR tokenizer against a real model's vocab offline:

  python tools/gen_tokenizer_fixtures.py models/all-MiniLM-L6-v2 \
      [--prompts tools/test_prompts.txt] [--out hf_tokenized_ids.txt]
  python tools/gen_tokenizer_fixtures.py models/all-MiniLM-L6-v2 --check
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_PROMPTS = [
    "Hello world!",
    "你好世界",
    "the quick brown fox jumps over the lazy dog",
    "Ich hab' 3.5 Jahre in Zürich gelebt — naïve café-goer!",
    "mixed 中文 and English 模型 test",
    "日本語のテキストです",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF model dir (tokenizer files)")
    ap.add_argument("--prompts", default=None,
                    help="file with one prompt per line")
    ap.add_argument("--out", default="hf_tokenized_ids.txt")
    ap.add_argument("--check", action="store_true",
                    help="also run our tokenizer and diff against HF")
    args = ap.parse_args()

    prompts = (Path(args.prompts).read_text(encoding="utf-8").splitlines()
               if args.prompts else DEFAULT_PROMPTS)
    try:
        from transformers import AutoTokenizer
    except ImportError:
        print("transformers not installed", file=sys.stderr)
        return 1
    hf = AutoTokenizer.from_pretrained(args.model)
    lines = [" ".join(map(str, hf(p)["input_ids"])) for p in prompts]
    Path(args.out).write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"wrote {args.out} ({len(prompts)} prompts)")

    if args.check:
        from embeddings_tpu.tokenizer import WordPieceTokenizer
        ours = WordPieceTokenizer.from_pretrained(Path(args.model))
        bad = 0
        for p, expect in zip(prompts, lines):
            got = " ".join(map(str, ours.encode(p)))
            if got != expect:
                bad += 1
                print(f"MISMATCH: {p!r}\n  hf : {expect}\n  ours: {got}")
        print(f"{len(prompts) - bad}/{len(prompts)} prompts match")
        return 1 if bad else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
