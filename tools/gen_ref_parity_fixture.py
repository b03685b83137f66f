"""Generate the reference-pipeline parity fixture (tests/fixtures/ref_parity).

Builds a tiny deterministic HF BERT model locally (no network), then runs
the *reference's own* converter (/root/reference/models/convert-to-ggml.py)
on it to produce ggml-model-{f32,f16}.bin. The committed artifacts let the
test suite prove our ggml reader/writer interoperate with files the
reference pipeline actually produced — not just with themselves.

Usage:
    python tools/gen_ref_parity_fixture.py [--check]

--check regenerates into a temp dir and diffs against the committed
fixture (guards against torch/transformers drift changing the artifact).
"""

from __future__ import annotations

import argparse
import filecmp
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "ref_parity"
REF_CONVERTER = Path("/root/reference/models/convert-to-ggml.py")

VOCAB = list(dict.fromkeys(  # dedupe: HF tokenizer vocab is a dict
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    + "the an and is was to of in on hello world test quick brown fox".split()
    + [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)]
    + list("你好世界中文")
))
# converter iterates range(vocab_size) over vocab.txt lines: pad to size
while len(VOCAB) % 8:
    VOCAB.append(f"[unused{len(VOCAB)}]")


def build_hf_dir(out: Path) -> None:
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    out.mkdir(parents=True, exist_ok=True)
    vocab_file = out / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    cfg = BertConfig(
        vocab_size=len(VOCAB), hidden_size=64, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=64)
    torch.manual_seed(0)
    model = BertModel(cfg)
    model = model.eval()
    model.save_pretrained(out)
    tok = BertTokenizerFast(vocab_file=str(vocab_file))
    tok.save_pretrained(out)


def run_reference_converter(model_dir: Path) -> None:
    if not REF_CONVERTER.exists():
        sys.exit(f"reference converter not found at {REF_CONVERTER}")
    for ftype in ("0", "1"):  # f32, f16
        subprocess.run(
            [sys.executable, str(REF_CONVERTER), str(model_dir), ftype],
            check=True, cwd=str(model_dir), stdout=subprocess.DEVNULL)


def generate(dest: Path) -> None:
    build_hf_dir(dest)
    run_reference_converter(dest)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="regenerate into a temp dir and diff vs committed")
    args = ap.parse_args()
    if args.check:
        if not FIXTURE.exists():
            print("no committed fixture to check against", file=sys.stderr)
            return 2
        with tempfile.TemporaryDirectory() as td:
            tmp = Path(td) / "ref_parity"
            generate(tmp)
            bad = [n for n in ("ggml-model-f32.bin", "ggml-model-f16.bin",
                               "model.safetensors", "vocab.txt")
                   if not filecmp.cmp(tmp / n, FIXTURE / n, shallow=False)]
            if bad:
                print(f"fixture drift in: {bad}", file=sys.stderr)
                return 1
            print("fixture matches regeneration")
            return 0
    if FIXTURE.exists():
        shutil.rmtree(FIXTURE)
    generate(FIXTURE)
    for p in sorted(FIXTURE.iterdir()):
        print(f"{p.relative_to(REPO)}  {p.stat().st_size} bytes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
