"""doc2tex_tpu — TPU-native image-to-LaTeX framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
doc2tex framework (PyTorch image-to-LaTeX recognition + detection):

- data building: LaTeX normalization/tokenization, rendering, vocab, LMDB
- training: bucketed variable-size image batches, encoder/decoder models
  assembled from YAML, bf16 + grad-accum + cosine LR + best-metric ckpts
- inference/eval: fully on-device greedy and batched beam decode
  (lax.scan + KV caches), token metrics and image-render metrics
- demo: math detection (SSD) + per-crop recognition

Design stance (TPU-first, not a port):
- all hot compute is jit-compiled XLA: static bucket shape table instead of
  dynamic per-image shapes; decoding is `lax.scan` on device instead of
  per-token Python loops with host sync
- batch-axis sharding over a `jax.sharding.Mesh` for multi-chip scaling
- bf16 matmuls with f32 layernorm/softmax
"""

__version__ = "0.1.0"


def __getattr__(name):  # lazy top-level API (avoids importing jax at pkg import)
    if name in ("load_config", "make_config"):
        from . import config as _c

        return getattr(_c, name)
    if name == "build_model":
        from .models import build_model

        return build_model
    if name == "create_converter":
        from .tokenizer.converters import create_converter

        return create_converter
    if name == "make_decode_fn":
        from .decode.runner import make_decode_fn

        return make_decode_fn
    if name in ("train", "init_training", "validation"):
        from . import engine as _e

        return getattr(_e, name)
    if name == "RecognitionServer":
        from .serving import RecognitionServer

        return RecognitionServer
    raise AttributeError(name)
