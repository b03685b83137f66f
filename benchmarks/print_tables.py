#!/usr/bin/env python
"""Format benchmark results as markdown tables (the reference's
benchmarks/print_tables.py equivalent). Handles both MTEB result JSONs
(results/{model}_{mode}/{Task}.json) and dtype_parity.py outputs."""

from __future__ import annotations

import json
import re
import sys
from collections import defaultdict
from pathlib import Path


# mode suffix of a results dir name: {model}_{mode}. Modes themselves
# contain underscores (q4_0, q8_0), so match against the known grammar
# instead of splitting on "_".
_MODE_RE = re.compile(
    r"_(f32|f16|bf16|q4_0|q4_1|q8_0|sbert)((?:-[a-z]+)*)$")


def split_run_name(name: str) -> tuple[str, str] | None:
    m = _MODE_RE.search(name)
    if m:
        return name[: m.start()], m.group(0)[1:]
    if "_" in name:  # unknown mode: best effort
        model, mode = name.rsplit("_", 1)
        return model, mode
    return None


def extract_mteb(results_dir: Path) -> dict:
    table: dict = defaultdict(dict)
    for run_dir in sorted(results_dir.iterdir()):
        if not run_dir.is_dir():
            continue
        parsed = split_run_name(run_dir.name)
        if parsed is None:
            continue
        model, mode = parsed
        for f in run_dir.glob("*.json"):
            data = json.loads(f.read_text())
            task = f.stem
            score = None
            # MTEB layouts vary; try the STS path then main_score
            for split in ("test", "validation"):
                node = data.get(split) or (data.get("scores", {}) or {}).get(split)
                if isinstance(node, list) and node:
                    node = node[0]
                if isinstance(node, dict):
                    cos = node.get("cos_sim") or {}
                    score = cos.get("spearman")
                    if score is None:
                        score = node.get("spearman")
                    if score is None:
                        score = node.get("accuracy")  # classification tasks
                    if score is None:
                        score = node.get("main_score")  # 0.0 is a valid score
                    if score is not None:
                        # old MTEB layouts nest evaluation_time per split
                        t_split = node.get("evaluation_time")
                        break
            else:
                t_split = None
            t = data.get("evaluation_time", t_split)
            table[(model, task)][mode] = (score, t)
    return table


def print_mteb(results_dir: Path) -> None:
    table = extract_mteb(results_dir)
    modes = sorted({m for row in table.values() for m in row})
    print("| model | task | " + " | ".join(modes) + " |")
    print("|" + "---|" * (2 + len(modes)))
    for (model, task), row in sorted(table.items()):
        cells = []
        for m in modes:
            s, t = row.get(m, (None, None))
            if s is None:
                cells.append("-")
            else:
                cells.append(f"{s:.4f} ({t:.1f}s)" if t is not None
                             else f"{s:.4f}")
        print(f"| {model} | {task} | " + " | ".join(cells) + " |")


def print_parity(path: Path) -> None:
    data = json.loads(path.read_text())
    dtypes = [d for d in data if d != "f32"]
    print("| dtype | mean cos vs f32 | STS-proxy spearman | "
          "STS-proxy pearson | eval (s) |")
    print("|---|---|---|---|---|")
    for d in dtypes:
        r = data[d]
        print(f"| {d} | {r['mean_cos_vs_f32']:.5f} | "
              f"{r['sts_proxy_spearman']:.5f} | "
              f"{r['sts_proxy_pearson']:.5f} | {r['eval_s']:.2f} |")


def main() -> int:
    target = Path(sys.argv[1] if len(sys.argv) > 1 else
                  Path(__file__).parent / "results")
    if target.is_file():
        print_parity(target)
    elif target.is_dir():
        print_mteb(target)
    else:
        print(f"nothing at {target}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
