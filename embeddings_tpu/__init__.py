"""embeddings_tpu — TPU-native quantized embedding-inference engine.

A from-scratch JAX/XLA/Pallas framework with the capability set of the
reference `embeddings.cpp` (ggml CPU BERT embedding engine): multilingual
WordPiece tokenization, BERT-family encoder forward with pad-mask attention,
mean/CLS pooling + L2 norm, weight-only Q4_0/Q4_1/Q8_0 blockwise
quantization with fused Pallas dequant-matmul kernels, bucketed batch
inference, data/tensor-parallel sharding over a TPU mesh, and a
continuous-batching embedding server.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("EMBEDDINGS_TPU_PLATFORM"):
    # Force a JAX backend (e.g. =cpu for smoke tests on a TPU host). The
    # plain JAX_PLATFORMS env var can be pinned by site startup hooks that
    # import jax before user code runs, so route through the config API.
    import jax as _jax

    _jax.config.update("jax_platforms",
                       _os.environ["EMBEDDINGS_TPU_PLATFORM"])

from .config import BertConfig, EngineConfig, KNOWN_MODELS
from .tokenizer import WordPieceTokenizer, WordPieceVocab

__all__ = [
    "BertConfig", "EngineConfig", "KNOWN_MODELS",
    "WordPieceTokenizer", "WordPieceVocab",
    "Engine", "load_model",
]


def __getattr__(name):  # lazy: keep `import embeddings_tpu` JAX-free
    if name in ("Engine", "load_model"):
        from .runtime import engine as _engine
        return getattr(_engine, {"Engine": "Engine", "load_model": "load_model"}[name])
    raise AttributeError(name)
