#!/usr/bin/env python
"""Classification-task evaluation from LOCAL data files — no `mteb`
package, no network.

The reference publishes EmotionClassification accuracy alongside STSB
(reference benchmarks/README.md:13-44: e.g. MiniLM-L6 f32 0.4082 vs
q4_0 0.3911). MTEB's classification protocol is: embed the train/test
texts, fit a logistic-regression probe on the train embeddings
(sklearn, max_iter=100), report test accuracy. That is exactly what
this script does, per dtype, the moment labeled TSVs exist locally —
same one-command design as run_stsb_local.py.

Data format (both files): ``label<TAB>text`` per line (label may be an
int or a string; it is treated categorically).

Usage:
  python benchmarks/run_cls_local.py -m models/all-MiniLM-L6-v2 \
      --train emotion-train.tsv --test emotion-test.tsv \
      [--modes f32 f16 q4_0 q4_1 q8_0] [--batch 32] [--task-name X]

Gate: prints Δaccuracy(quantized vs f32) and exits non-zero when a
quantized mode loses more than --budget (default 0.02 — the reference's
own q4_0 Emotion drop is 0.017, so parity means staying in that band).
Results land in the reference's layout:
results/{model}_{mode}/{task}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("JAX_PLATFORMS"):
    # the image's sitecustomize imports jax at startup pinned to the TPU;
    # honor an explicit platform request (e.g. CPU runs in CI)
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

MODES = ["f32", "f16", "q4_0", "q4_1", "q8_0"]


def load_rows(path: Path) -> tuple[list[str], list[str]]:
    labels, texts = [], []
    for line in path.read_text(encoding="utf-8").splitlines():
        if not line.strip():
            continue
        label, text = line.split("\t", 1)
        labels.append(label)
        texts.append(text)
    return labels, texts


def probe_accuracy(train_x: np.ndarray, train_y: list[str],
                   test_x: np.ndarray, test_y: list[str],
                   seed: int = 42) -> float:
    """MTEB's classification protocol: logistic regression probe
    (sklearn, max_iter=100) on the embeddings."""
    from sklearn.linear_model import LogisticRegression
    clf = LogisticRegression(max_iter=100, random_state=seed)
    clf.fit(train_x, train_y)
    return float(clf.score(test_x, test_y))


def evaluate_mode(model_path: str, mode: str, train, test, batch: int,
                  server_url: str | None = None) -> dict:
    train_y, train_texts = train
    test_y, test_texts = test
    t0 = time.time()
    if server_url:
        from embeddings_tpu.runtime.client import HttpClient
        client = HttpClient(server_url, timeout=600)

        def enc(texts):
            return np.concatenate([client.embed(texts[i:i + batch])
                                   for i in range(0, len(texts), batch)])
    else:
        from embeddings_tpu.runtime.engine import load_model
        engine = load_model(model_path, dtype=mode.split("-")[0])

        def enc(texts):
            if mode.endswith("-packed"):
                return engine.encode_batch_packed(texts)
            bs = 1 if mode.endswith("-batchless") else batch
            return engine.encode_batch(texts, batch_size=bs)

    train_x = enc(train_texts)
    test_x = enc(test_texts)
    acc = probe_accuracy(train_x, train_y, test_x, test_y)
    return {"accuracy": acc, "evaluation_time": round(time.time() - t0, 2),
            "n_train": len(train_y), "n_test": len(test_y)}


def write_result(out_dir: Path, model_name: str, mode: str, task: str,
                 r: dict) -> None:
    d = out_dir / f"{model_name}_{mode}"
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{task}.json").write_text(json.dumps({
        "mteb_dataset_name": task,
        "test": {"accuracy": r["accuracy"],
                 "evaluation_time": r["evaluation_time"]},
        "source": "benchmarks/run_cls_local.py (local data, no mteb pkg)",
    }, indent=1))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True,
                    help="HF dir / .npz / .bin / .gguf checkpoint")
    ap.add_argument("--train", required=True, help="label\\ttext TSV")
    ap.add_argument("--test", required=True, help="label\\ttext TSV")
    ap.add_argument("--modes", nargs="+", default=MODES)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--budget", type=float, default=0.02,
                    help="max allowed accuracy drop vs f32")
    ap.add_argument("--task-name", default="EmotionClassification")
    ap.add_argument("--server-url", default=None,
                    help="evaluate through a live HTTP server instead; "
                         "--modes then names the single label to record")
    ap.add_argument("--out", default=str(Path(__file__).parent / "results"))
    args = ap.parse_args()

    train = load_rows(Path(args.train))
    test = load_rows(Path(args.test))
    print(f"{len(train[0])} train / {len(test[0])} test rows, "
          f"{len(set(train[0]))} classes", flush=True)
    from run_stsb_local import infer_model_name
    model_name = infer_model_name(args.model)

    results: dict[str, dict] = {}
    modes = args.modes[:1] if args.server_url else args.modes
    for mode in modes:
        r = evaluate_mode(args.model, mode, train, test, args.batch,
                          server_url=args.server_url)
        results[mode] = r
        write_result(Path(args.out), model_name, mode, args.task_name, r)
        print(f"{mode:>16}: accuracy={r['accuracy']:.4f} "
              f"time={r['evaluation_time']}s", flush=True)

    ref = results.get("f32") or results.get("f16")
    rc = 0
    if ref:
        for mode, r in results.items():
            if mode.split("-")[0] in ("q4_0", "q4_1", "q8_0"):
                delta = ref["accuracy"] - r["accuracy"]
                ok = delta <= args.budget
                print(f"Δaccuracy({mode} vs f32) = {delta:+.4f} "
                      f"[{'OK' if ok else 'FAIL'} budget {args.budget}]")
                rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
