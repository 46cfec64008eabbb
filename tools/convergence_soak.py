"""Convergence soak: overfit 64 synthetic formulas on the real TPU chip.

Evidence that the full training path (bucketed loader -> fused train step ->
cosine schedule -> on-device greedy decode) learns end-to-end.  Last run
(v5e-1, 8000 steps, 16 bucket shapes): final train-set exact match 0.938,
loss 4.16 -> 0.26 (/root/repo history: commit message of this file's commit).

Run: python tools/convergence_soak.py   (takes ~15 min incl. ~16 compiles)
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from doc2tex_tpu.config import make_config
from doc2tex_tpu.data.loader import ArrayDataset, BucketLoader
from doc2tex_tpu.data.synthetic import SYNTH_VOCAB, synth_dataset
from doc2tex_tpu.tokenizer.converters import AttnLabelConverter
from doc2tex_tpu.models import build_model
from doc2tex_tpu.train.trainer import (
    create_train_state, criterion_from_config, make_train_step,
)
from doc2tex_tpu.decode.runner import make_decode_fn
from doc2tex_tpu.eval import exact_match

cfg = make_config(dict(
    max_dimension=[64, 512], min_dimension=[32, 32], batch_max_length=24,
    batch_size=16, augment=False,
    FeatureExtraction={"name": "None"},
    SequenceModeling={"name": "ViT", "params": {
        "backbone": {"name": "resnet", "input_channel": 1,
                     "output_channel": 128, "gcb": False},
        "fix_embed": True, "input_channel": 1, "patching_style": "2d",
        "patch_size": [2, 2], "depth": 3, "num_heads": 4, "hidden_size": 128}},
    Prediction={"name": "Attnv2", "params": {
        "seqmodel": "TFM", "input_size": 128, "hidden_size": 128,
        "kernel_size": 2, "kernel_dim": 64, "embed_target": True,
        "enc_init": True, "attn_type": "coverage", "droprate": 0.1}},
    criterion={"name": "entropy"},
    optimizer={"opt": "adamw", "lr": 0.001, "weight_decay": 0.000002},
    num_iter=8000, valInterval=500, warmup_epochs=1, min_lr=0.0001,
))

images, labels = synth_dataset(64, seed=11, max_len=12, max_h=56)
ds = ArrayDataset(images, labels)
conv = AttnLabelConverter(SYNTH_VOCAB)
loader = BucketLoader(ds, conv, cfg, train=True, seed=0)
print(f"{loader.num_samples} samples, {len(loader.table)} buckets", flush=True)

model = build_model(cfg, conv.num_classes)
state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (16, 64, 64, 1))
criterion = criterion_from_config(cfg)
step = make_train_step(model, criterion, tx, cfg)
rng = jax.random.PRNGKey(2)

t0 = time.time()
it = 0
for batch in loader.infinite():
    state, m = step(state, jnp.asarray(batch.images), jnp.asarray(batch.text), rng)
    it += 1
    if it % 100 == 0:
        print(f"[{it}] loss {float(m['loss']):.4f} tok_acc {float(m['token_acc']):.3f} "
              f"({time.time()-t0:.0f}s)", flush=True)
    if it >= 8000:
        break

# greedy decode over the train set: expect near-perfect memorization
variables = {"params": state.params, "batch_stats": state.batch_stats}
eval_loader = BucketLoader(ds, conv, cfg, train=False, prefetch=0)
decode = make_decode_fn(model, cfg, beam_size=1)
preds, gts = [], []
for b in eval_loader:
    toks, _ = decode(variables, jnp.asarray(b.images))
    preds += [" ".join(t) for t in conv.detokenize(np.asarray(toks))]
    gts += b.labels
em = exact_match(preds, gts)
print(f"FINAL exact match on train set: {em:.3f} ({len(gts)} samples)", flush=True)
print("sample gt:  ", gts[0])
print("sample pred:", preds[0])
assert em > 0.75, "model failed to memorize"
print("CONVERGENCE OK")
