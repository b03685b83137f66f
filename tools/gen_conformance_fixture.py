"""Generate the large-scale tokenizer conformance fixture
(tests/fixtures/big_vocab): a ~30k-token realistic WordPiece vocab, an
adversarial multilingual prompt set, and golden ids from the HF rust
`tokenizers` oracle.

The reference validates its tokenizer against HF over the real 30k model
vocab (test_tokenizer.sh + examples/test_hf_tokenizer.py). This image has
no network, so we build a vocab of the same scale and shape — thousands of
shared-prefix word families, subword pieces, CJK/kana/Hangul, digits,
punctuation — which stresses greedy longest-match-first exactly where big
vocabs do. The oracle (HF rust WordPiece + BertNormalizer, the same
pipeline bert-base-uncased uses) is the ground truth either way.

Usage:
    python tools/gen_conformance_fixture.py [--check]
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "fixtures" / "big_vocab"

ONSETS = ("b bl br c ch cl cr d dr f fl fr g gl gr h j k l m n p ph pl pr "
          "qu r s sc sh sk sl sm sn sp st str t th tr tw v w wh wr y z "
          "").split() + [""]
VOWELS = "a e i o u ai ea ee oo ou ie ei au oa".split()
CODAS = ("b ck ct d ft g k l ld ll lt m mp n nd ng nk nt p pt r rd rk rm "
         "rn rt s sh sk sp ss st t th x z "
         "").split() + [""]
SUFFIXES = ("s ed ing er est ly ness ment ion ation able ible ful less ish "
            "ity ize ise ous ive al ic").split()


def _syllable(rng: random.Random) -> str:
    return (rng.choice(ONSETS) + rng.choice(VOWELS) + rng.choice(CODAS))


def _word(rng: random.Random) -> str:
    n = rng.choices((1, 2, 3, 4), weights=(20, 50, 25, 5))[0]
    return "".join(_syllable(rng) for _ in range(n))[:18]


def build_vocab() -> list[str]:
    rng = random.Random(20260816)
    toks: list[str] = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]

    words: set[str] = set()
    # shared-prefix word families: root + derived forms, so greedy
    # longest-match has many viable prefixes to (wrongly) stop at
    while len(words) < 9000:
        root = _word(rng)
        if not root:
            continue
        words.add(root)
        for sfx in rng.sample(SUFFIXES, k=rng.randint(0, 4)):
            words.add((root + sfx)[:20])
    toks += sorted(words)

    # subword pieces: full single/double letter coverage + longer pieces
    # (many sharing prefixes), common suffixes
    letters = [chr(c) for c in range(ord("a"), ord("z") + 1)]
    toks += letters
    toks += ["##" + a for a in letters]
    toks += ["##" + a + b for a in letters for b in letters]
    pieces: set[str] = set()
    while len(pieces) < 4000:
        p = _syllable(rng) + rng.choice([""] + SUFFIXES)
        if 3 <= len(p) <= 10:
            pieces.add("##" + p)
    toks += sorted(pieces)
    toks += ["##" + s for s in SUFFIXES]

    # digits and numbers
    digits = [str(d) for d in range(10)]
    toks += digits + ["##" + d for d in digits]
    toks += [f"{y}" for y in range(1900, 2031)]
    toks += [f"{n:02d}" for n in range(100)]

    # ASCII punctuation as word and subword forms, plus common unicode punct
    punct = list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")
    toks += punct + ["##" + p for p in punct]
    toks += list("–—…“”‘’«»·•€£¥°")

    # CJK: each char is isolated by the normalizer, so single-char tokens.
    # Dense sample of the URO + extension A/B edges incl. the hf-rust
    # quirk boundary near 0x2B920 (bert.cpp:287 documents the same).
    cjk: list[str] = []
    cjk += [chr(c) for c in range(0x4E00, 0x9FA6, 3)]      # URO sample
    cjk += [chr(c) for c in range(0x3400, 0x4DB6, 16)]     # ext A sample
    cjk += [chr(c) for c in range(0x20000, 0x20100, 8)]    # ext B start
    cjk += [chr(c) for c in (0x2B81D, 0x2B81E, 0x2B81F, 0x2B820, 0x2B91F,
                             0x2B920, 0x2B921, 0x2CEA0, 0x2CEA1)]
    cjk += [chr(c) for c in range(0xF900, 0xFA6E, 2)]      # compat ideographs
    toks += cjk
    toks += list("、。「」『』,!?;:()〜ー")

    # kana (words, not CJK-isolated): full hiragana/katakana + a few
    # multi-char kana words; halfwidth katakana
    hira = [chr(c) for c in range(0x3041, 0x3097)]
    kata = [chr(c) for c in range(0x30A1, 0x30FB)]
    toks += hira + kata
    toks += [chr(c) for c in range(0xFF66, 0xFFA0)]        # halfwidth kana
    kana_words = set()
    while len(kana_words) < 300:
        kana_words.add("".join(rng.choices(hira, k=rng.randint(2, 4))))
    toks += sorted(kana_words)
    toks += ["##" + k for k in sorted(kana_words)[:100]]

    # Hangul syllables (whole-word script for HF BERT) + a jamo sample
    toks += [chr(c) for c in range(0xAC00, 0xD7A4, 23)]
    toks += [chr(c) for c in range(0x1100, 0x1113)]

    # Cyrillic and Greek lowercase words
    cyr = [chr(c) for c in range(0x0430, 0x0450)]
    grk = [chr(c) for c in range(0x03B1, 0x03CA)]
    for alpha in (cyr, grk):
        ws = set()
        while len(ws) < 200:
            ws.add("".join(rng.choices(alpha, k=rng.randint(2, 8))))
        toks += sorted(ws)
        toks += ["##" + w for w in sorted(ws)[:50]]

    # post-normalization accented forms do not survive strip_accents, but
    # raw-vocab realism includes them (they become unreachable entries,
    # exactly like real vocabs carry unreachable cased/accented tokens)
    toks += ["café", "zürich", "naïve", "résumé", "señor", "über"]

    seen, out = set(), []
    for t in toks:
        if t and t not in seen:
            seen.add(t)
            out.append(t)
    while len(out) % 64:
        out.append(f"[unused{len(out)}]")
    return out


def build_prompts(vocab: list[str]) -> list[str]:
    rng = random.Random(43)
    words = [t for t in vocab if t.isascii() and t.isalpha() and len(t) > 2]
    cjk = [t for t in vocab if len(t) == 1 and ord(t) > 0x3000]
    prompts: list[str] = [
        # the reference's own coverage categories (test_prompts.txt)
        "Hello world! This is a longest-match stress test.",
        "you know, this isn't just ASCII... is it?",
        "int main(void) { return printf(\"%d\\n\", 42); }",
        "我们在这里测试中文的分词器",
        "日本語のテキストとひらがなとカタカナ",
        "mixed 中文 and English with 日本語 too",
        # adversarial
        "Café NAÏVE Über-résumé señor ZÜRICH",
        "ﬁ ﬂ ligatures and ǅ titlecase İstanbul ı",
        "ＦＵＬＬｗｉｄｔｈ and ﾊﾝｶｸ ｶﾀｶﾅ",
        "한국어 텍스트 조합",
        "«quoted» “smart quotes” — em-dash … ellipsis",
        "tabs\tand\nnewlines\r\nand  runs   of    spaces",
        "emoji 😀🎉 ZWJ 👩‍💻 skin 👍🏽 flags 🇯🇵",
        "math ∑∫√ ≤ ≥ ≠ and arrows → ← ⇒",
        "a" * 120 + " " + "b" * 99,                # >100-char word => UNK
        "".join(rng.choices(cjk, k=80)),           # long CJK run
        "𫡐𫤰𫤱" + chr(0x2B81F) + chr(0x2B820),      # quirk boundary chars
        "豈更 compat ideographs",
        "null\x00byte and control\x07chars",
        "ᚠᚢᚦ runes and ⠃⠗ braille",                # fully OOV scripts
        "عربى text and עברית text",                 # RTL scripts
        "ᾼῼ iota subscripts ΐΰ",
        "ΛΟΓΟΣ ΟΔΥΣΣΕΥΣ τέλος Σ",   # Final_Sigma: hf lowers char-wise                    # greek edge cases
        "ß sharp s and ẞ capital",
        "12,345.67 89% $100 3.14159 2e-5 0xFF",
        "pneumonoultramicroscopicsilicovolcanoconiosis",
        "",
        " ",
        "     ",
        "-",
        "##",
        "[CLS] tricky [SEP] literal specials [MASK]",
    ]
    # synthesized sentences from in-vocab words (high match density, all
    # word-family boundaries get exercised) with punctuation sprinkled
    for _ in range(120):
        n = rng.randint(3, 18)
        ws = rng.choices(words, k=n)
        if rng.random() < 0.5:
            ws.insert(rng.randrange(len(ws)), rng.choice(cjk))
        sep = rng.choice([" ", " ", " ", ", ", ". ", "-", "'"])
        p = sep.join(ws)
        if rng.random() < 0.3:
            p = p.capitalize() + rng.choice(".!?…")
        prompts.append(p)
    # word-fragment soup: random cuts of vocab words, forcing subword paths
    for _ in range(60):
        frags = []
        for _ in range(rng.randint(2, 10)):
            w = rng.choice(words)
            cut = rng.randint(1, len(w))
            frags.append(w[:cut] + w[cut:][::-1])
        prompts.append(" ".join(frags))
    return prompts


def build_oracle(vocab: list[str]):
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
    from tokenizers.processors import TemplateProcessing
    vd = {t: i for i, t in enumerate(vocab)}
    tok = Tokenizer(models.WordPiece(vd, unk_token="[UNK]",
                                     max_input_chars_per_word=100))
    tok.normalizer = normalizers.BertNormalizer(
        clean_text=True, handle_chinese_chars=True, strip_accents=None,
        lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        special_tokens=[("[CLS]", vd["[CLS]"]), ("[SEP]", vd["[SEP]"])])
    return tok


def generate(dest: Path) -> None:
    dest.mkdir(parents=True, exist_ok=True)
    vocab = build_vocab()
    prompts = build_prompts(vocab)
    oracle = build_oracle(vocab)
    golden = [" ".join(map(str, oracle.encode(p).ids)) for p in prompts]
    (dest / "vocab.txt").write_text("\n".join(vocab) + "\n",
                                    encoding="utf-8")
    # prompts may contain \n/\r/\0: store escaped one-per-line
    esc = [p.encode("unicode_escape").decode("ascii") for p in prompts]
    (dest / "prompts.txt").write_text("\n".join(esc) + "\n",
                                      encoding="utf-8")
    (dest / "hf_golden_ids.txt").write_text("\n".join(golden) + "\n",
                                            encoding="utf-8")
    print(f"{dest}: vocab={len(vocab)} prompts={len(prompts)}")


def load_prompts(dest: Path = FIXTURE) -> list[str]:
    esc = (dest / "prompts.txt").read_text(encoding="utf-8").splitlines()
    return [e.encode("ascii").decode("unicode_escape") for e in esc]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="regenerate goldens and diff against committed "
                         "(guards tokenizers-library drift)")
    args = ap.parse_args()
    if args.check:
        vocab = (FIXTURE / "vocab.txt").read_text(
            encoding="utf-8").splitlines()
        prompts = load_prompts()
        oracle = build_oracle(vocab)
        golden = [" ".join(map(str, oracle.encode(p).ids)) for p in prompts]
        committed = (FIXTURE / "hf_golden_ids.txt").read_text(
            encoding="utf-8").splitlines()
        bad = sum(1 for a, b in zip(golden, committed) if a != b)
        bad += abs(len(golden) - len(committed))
        print(f"{len(golden) - bad}/{len(golden)} golden lines match")
        return 1 if bad else 0
    generate(FIXTURE)
    return 0


if __name__ == "__main__":
    sys.exit(main())
