"""Inference / evaluation CLI — reference ``api/infer.py:270-415`` surface.

Evaluates a model over (a) a CSV manifest + image dir (reference
``TestDatasetSingle``), (b) an LMDB split (``eval_data`` in the config), or
(c) synthetic data (``synthetic_data: N``), reporting exact match, BLEU-4,
char/word NED, timing and memory — and optionally a per-sample CSV.

TPU-native: images are grouped into the static bucket ladder and decoded in
batches fully on device (greedy or beam from ``beam_size``), instead of the
reference's batch-1 Python loops.

Usage:
    python api/infer.py --config config/test.yaml --data_dir imgs/ \
        --csv_dir labels.csv --log_path out/ --batch_size 32
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def make_resizer_hook(config):
    """Learned width-bucket resizer hook (reference --resizer path,
    ``api/infer.py:389-398`` + resize loop ``predict_utils.py:14-115``)."""
    import jax
    import jax.numpy as jnp

    from doc2tex_tpu.models.extras import LearnedResizer
    from doc2tex_tpu.transforms.preprocess import _resize_area, learned_resize

    model = LearnedResizer(num_buckets=config.get("resizer_buckets", 21))
    probe = jnp.zeros((1, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), probe)
    # resolve locally — mutating the caller's config dict would leak an
    # auto-discovered path into shared/reused configs (ADVICE r4)
    resizer_weights = config.get("resizer_weights")
    if not resizer_weights:
        # round 4: trained width-predictor weights ship in-repo
        # (tools/train_resizer.py); use them when present
        shipped = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "saved_models", "resizer", "best_weights.msgpack",
        )
        if os.path.exists(shipped):
            resizer_weights = shipped
    if resizer_weights:
        # params AND BN running stats — the width head is a BatchNorm
        # ResNet; fresh stats would mis-normalize every trained feature
        from doc2tex_tpu.train.checkpoint import load_pretrained_variables

        params, stats, _ = load_pretrained_variables(
            resizer_weights, variables["params"],
            variables.get("batch_stats"),
        )
        variables = {**variables, "params": params}
        if stats is not None:
            variables["batch_stats"] = stats
    apply_fn = jax.jit(lambda x: jnp.argmax(model.apply(variables, x), -1))

    def predict(img):
        x = _resize_area(img, 64, 64).astype(np.float32)[None, ..., None]
        return int(apply_fn(jnp.asarray(x))[0])

    def hook(img):
        return learned_resize(img, predict)

    return hook


def load_csv_dataset(csv_dir: str, data_dir: str, config, resize_hook=None):
    """CSV manifest (id<TAB>label) + image dir -> ArrayDataset with
    inference-time resize (reference ``TestDatasetSingle`` api/infer.py:29-70
    + ``resize`` predict_utils.py:14-115)."""
    from PIL import Image

    from doc2tex_tpu.data.loader import ArrayDataset
    from doc2tex_tpu.transforms.preprocess import resize_for_inference

    images, labels, names = [], [], []
    with open(csv_dir, newline="") as f:
        # QUOTE_NONE: LaTeX labels legitimately contain `"` — default csv
        # quoting silently merges such rows with their neighbours
        reader = csv.reader(f, delimiter="\t", quoting=csv.QUOTE_NONE)
        rows = [r for r in reader if len(r) >= 2]
    if rows and rows[0][0].lower() in ("id", "image", "name"):
        rows = rows[1:]
    for name, label in ((r[0], r[1]) for r in rows):
        path = os.path.join(data_dir, name)
        if not os.path.exists(path):
            continue
        img = np.asarray(Image.open(path).convert("L"), np.uint8)
        if resize_hook is not None:
            img = resize_hook(img)
        images.append(resize_for_inference(img, config))
        labels.append(label)
        names.append(name)
    return ArrayDataset(images, labels, names)


def run_infer(config, dataset, log_path: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    if jax.default_backend() == "tpu":
        # persistent compile cache: chunked TFM decode compiles one loop
        # body per chunk (~minutes cold, seconds cached)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

    from doc2tex_tpu.data.loader import BucketLoader
    from doc2tex_tpu.decode.runner import make_decode_fn
    from doc2tex_tpu.engine.inferencing import validation
    from doc2tex_tpu.models import build_model
    from doc2tex_tpu.tokenizer.converters import create_converter
    from doc2tex_tpu.train.checkpoint import load_pretrained_variables
    from doc2tex_tpu.train.trainer import init_model, param_count

    converter = create_converter(config)
    config["num_class"] = converter.num_classes
    model = build_model(config, converter.num_classes)

    h0, w0 = config["min_dimension"]
    params, batch_stats = init_model(
        model, jax.random.PRNGKey(0),
        (config["batch_size"], h0, w0, 1), config["batch_max_length"] + 1,
    )
    if config.get("saved_model"):
        params, batch_stats, info = load_pretrained_variables(
            config["saved_model"], params, batch_stats
        )
        print(f"loaded weights: {info}")

    loader = BucketLoader(
        dataset, converter, config, train=False,
        prefetch=int(config.get("prefetch", 2)),
    )

    mesh = None
    if jax.device_count() > 1:
        from doc2tex_tpu.parallel import make_mesh

        mesh = make_mesh()  # all chips on the data axis
        print(f"sharding inference over {jax.device_count()} devices")

    class _State:
        pass

    state = _State()
    state.params = params
    state.batch_stats = batch_stats

    beam = int(config.get("beam_size", 1))
    # `quantize: int8` (config or --int8): trace decode through the int8
    # encoder path (ops/quant.py) — measured zero exact-match cost on the
    # released weights, +27% headline throughput (BASELINE.md).
    # `int8_full` additionally stores the decode attention memory int8.
    quant_ctx = None
    from doc2tex_tpu.ops.quant import parts_for_mode

    quant_parts = parts_for_mode(config.get("quantize"))
    if quant_parts:
        from doc2tex_tpu.ops.quant import quantized_inference

        quant_ctx = quantized_inference(parts=quant_parts)
        quant_ctx.__enter__()
    t0 = time.time()
    try:
        result = validation(
            model, state, converter, loader, config,
            eval_step=None, beam_size=beam, mesh=mesh,
            export_csv=(os.path.join(log_path, "predictions.csv") if log_path else None),
        )
    finally:
        if quant_ctx is not None:
            quant_ctx.__exit__(None, None, None)
    elapsed = time.time() - t0
    n = max(result["n_samples"], 1)
    result["total_time_s"] = elapsed
    result["avg_infer_time_s"] = elapsed / n
    result["images_per_sec"] = n / elapsed
    result["params_M"] = param_count(params) / 1e6
    try:
        import resource

        result["peak_mem_mb"] = (
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        )
    except Exception:
        pass
    return result


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--csv_dir", default=None, help="CSV manifest (id\\tlabel)")
    parser.add_argument("--data_dir", default=None, help="Image folder")
    parser.add_argument("--log_path", default=None)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--beam_size", type=int, default=None)
    parser.add_argument("--start_idx", type=int, default=0)
    parser.add_argument(
        "--num_workers", type=int, default=-1,
        help="host prefetch depth (reference DataLoader workers); -1 = default",
    )
    parser.add_argument(
        "--strong_log", action="store_true", default=False,
        help="print every sample's gt/pred line (reference api/infer.py:389)",
    )
    parser.add_argument(
        "--amp", action="store_true", default=False,
        help="bf16 compute dtype (reference AMP branch api/infer.py:120-124); "
        "bf16 is already the config default — --amp forces it on",
    )
    parser.add_argument("--resizer", action="store_true", default=False)
    parser.add_argument(
        "--int8", action="store_true", default=False,
        help="int8 dynamic-quant encoder (ops/quant.py); zero EM cost "
        "measured on the released weights, +27% throughput",
    )
    parser.add_argument(
        "--int8-full", action="store_true", default=False,
        help="--int8 plus int8 decode attention memory (halves decode-step "
        "HBM reads); equivalent to `quantize: int8_full` in the config",
    )
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="force a jax platform (env JAX_PLATFORMS may be pinned; "
        "jax.config.update works post-import)",
    )
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from doc2tex_tpu.config import load_config
    from doc2tex_tpu.data.loader import ArrayDataset, LmdbDataset

    config = load_config(args.config)
    config["batch_size"] = args.batch_size
    if args.beam_size is not None:
        config["beam_size"] = args.beam_size
    if args.amp:
        config["dtype"] = "bfloat16"
    if args.int8:
        config["quantize"] = "int8"
    if args.int8_full:
        config["quantize"] = "int8_full"
    if args.num_workers >= 0:
        config["prefetch"] = args.num_workers

    if args.csv_dir and args.data_dir:
        hook = make_resizer_hook(config) if args.resizer else None
        dataset = load_csv_dataset(args.csv_dir, args.data_dir, config, hook)
    elif config.get("eval_data") and os.path.isdir(config["eval_data"]):
        dataset = LmdbDataset(config["eval_data"], rgb=config.get("rgb", False))
    elif config.get("synthetic_data"):
        from doc2tex_tpu.data.synthetic import synth_dataset

        images, labels = synth_dataset(int(config["synthetic_data"]), seed=7)
        dataset = ArrayDataset(images, labels)
    else:
        parser.error("need --csv_dir/--data_dir, or eval_data/synthetic_data in config")

    if args.log_path:
        os.makedirs(args.log_path, exist_ok=True)
    result = run_infer(config, dataset, args.log_path)
    if args.strong_log:
        # per-sample lines (reference strong_log, api/infer.py:389-413)
        for name, gt, pred in result.get("samples", []):
            print(f"[{name}] {'OK ' if pred == gt else 'ERR'} gt={gt!r} pred={pred!r}")
    if args.log_path:
        import json

        with open(os.path.join(args.log_path, "metrics.json"), "w") as f:
            json.dump(
                {k: v for k, v in result.items() if isinstance(v, (int, float))},
                f, indent=2,
            )

    print(f"samples:        {result['n_samples']}")
    print(f"exact match:    {result['accuracy']:.4f}")
    print(f"BLEU-4:         {result['bleu']:.4f}")
    print(f"char NED match: {result['ED']:.4f}")
    print(f"word NED match: {result['word_ED']:.4f}")
    print(f"images/sec:     {result['images_per_sec']:.2f}")
    print(f"avg time/image: {result['avg_infer_time_s']*1000:.1f} ms")
    print(f"avg infer:      {result.get('avg_infer_s', 0)*1000:.1f} ms")
    print(f"avg postproc:   {result.get('avg_postprocess_s', 0)*1000:.1f} ms")
    if "peak_mem_mb" in result:
        print(f"peak mem:       {result['peak_mem_mb']:.0f} MB")


if __name__ == "__main__":
    main()
