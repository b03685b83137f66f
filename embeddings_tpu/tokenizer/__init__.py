from pathlib import Path

from .bpe import ByteLevelBPETokenizer
from .unigram import UnigramTokenizer
from .wordpiece import (WordPieceTokenizer, WordPieceVocab, normalize,
                        pre_tokenize)

__all__ = ["WordPieceTokenizer", "WordPieceVocab", "ByteLevelBPETokenizer",
           "UnigramTokenizer", "normalize", "pre_tokenize",
           "tokenizer_from_dir"]


def tokenizer_from_dir(model_dir):
    """Build the right tokenizer for an HF model directory: WordPiece
    when vocab.txt is present (BERT family — the reference's only
    tokenizer, bert.cpp:470-495), byte-level BPE for vocab.json +
    merges.txt or a BPE tokenizer.json (RoBERTa family), Unigram for a
    Unigram tokenizer.json OR a raw sentencepiece .model file
    (XLM-R/ALBERT families; spiece.model parsed pure-Python)."""
    model_dir = Path(model_dir)
    if (model_dir / "vocab.txt").exists():
        return WordPieceTokenizer.from_pretrained(model_dir)
    tj = model_dir / "tokenizer.json"
    if ((model_dir / "vocab.json").exists()
            and (model_dir / "merges.txt").exists()):
        return ByteLevelBPETokenizer.from_pretrained(model_dir)
    if tj.exists():
        import json
        with open(tj, encoding="utf-8") as f:
            kind = (json.load(f).get("model") or {}).get("type")
        if kind == "BPE":
            return ByteLevelBPETokenizer.from_pretrained(model_dir)
        if kind == "Unigram":
            return UnigramTokenizer.from_pretrained(model_dir)
        raise ValueError(
            f"unsupported tokenizer.json model type {kind!r} in "
            f"{model_dir} (WordPiece via vocab.txt, byte-level BPE, "
            f"and Unigram are supported)")
    if any((model_dir / n).exists()
           for n in ("spiece.model", "sentencepiece.bpe.model",
                     "tokenizer.model")):
        # raw sentencepiece model; style inferred from config.json
        return UnigramTokenizer.from_pretrained(model_dir)
    raise FileNotFoundError(
        f"no tokenizer files in {model_dir} (vocab.txt, "
        f"vocab.json+merges.txt, tokenizer.json, or a sentencepiece "
        f".model file)")
