"""Worker for the two-process jax.distributed test (spawned by
tests/test_multihost.py::test_two_process_distributed_encode)."""
import sys, os
proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import jax
jax.config.update("jax_platforms", "cpu")
from embeddings_tpu.parallel.multihost import (auto_initialize,
                                               distributed_encode_batch)
ok = auto_initialize(coordinator=f"127.0.0.1:{port}", num_processes=nproc,
                     process_id=proc_id)
assert ok and jax.process_count() == nproc, (ok, jax.process_count())
import numpy as np
from embeddings_tpu.config import BertConfig, EngineConfig
from embeddings_tpu.models import params as P
from embeddings_tpu.runtime.engine import Engine
from embeddings_tpu.tokenizer import WordPieceTokenizer, WordPieceVocab
toks = (["[PAD]","[UNK]","[CLS]","[SEP]"] + "hello world the quick brown fox".split()
        + [chr(c) for c in range(ord('a'), ord('z')+1)])
cfg = BertConfig(vocab_size=len(toks), hidden_size=64, num_hidden_layers=2,
                 num_attention_heads=4, intermediate_size=128,
                 max_position_embeddings=64)
eng = Engine(P.init_params(cfg, rng=0), cfg,
             WordPieceTokenizer(WordPieceVocab.from_tokens(toks)),
             EngineConfig(seq_buckets=(16, 32), max_seq_len=32, batch_size=4,
                          batch_buckets=(1, 2, 4)))
texts = ["hello world", "the quick brown fox", "fox fox fox",
         "hello", "world the fox", "quick brown", "the the the"]
out = distributed_encode_batch(eng, texts)
ref = eng.encode_batch(texts)   # local full computation for comparison
err = float(np.abs(out - ref).max())
print(f"proc {proc_id}/{nproc}: global result {out.shape}, "
      f"max|distributed - local| = {err:.2e}", flush=True)
assert err < 1e-4
