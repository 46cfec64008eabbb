"""SSD detection convergence soak on synthetic GTDB-style pages.

Trains the flax SSD512 with the jitted MultiBox train step on generated
page images (black formula bars on white, .pmath-style boxes), then
evaluates held-out pages through detect -> stitch -> CROHME coarse/fine
scoring — the full detection stack learning end-to-end, which the unit
tests only smoke.

Run (real TPU): python tools/detection_soak.py [--steps N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_page(rng, size=512, max_regions=4, style="bars"):
    """One (image u8 (S,S), boxes (K,4) normalized corner) page.

    ``style='bars'``: the round-2 "formula-ish ink" noise bars.
    ``style='mixed'``: REAL formula renders — hard-benchmark (multi-font,
    render noise; what the released recognizers consume) mixed 50/50 with
    structured-grammar renders.  Round-4 page_eval showed the bars-trained
    detector collapses on real renders (det-F1 0.108 on hard regions vs
    0.485 structured vs 0.79 on its own bars distribution) — train-time
    regions must match the demo distribution."""
    img = np.full((size, size), 255, np.uint8)
    boxes = []
    k = int(rng.integers(1, max_regions + 1))
    for _ in range(k):
        if style == "mixed":
            from doc2tex_tpu.data.synthetic import (
                synth_hard_sample,
                synth_structured_sample,
            )

            if rng.random() < 0.5:
                patch_img, _ = synth_hard_sample(
                    rng, min_len=4, max_len=22, max_h=120, max_w=400,
                    scale_range=(3, 5),
                )
            else:
                patch_img, _ = synth_structured_sample(
                    rng, min_len=3, max_len=20, max_h=120, max_w=400,
                )
            h, w = patch_img.shape
            if h > size - 8 or w > size - 8:
                continue
            placed = False
            for _try in range(10):
                y = int(rng.integers(0, size - h))
                x = int(rng.integers(0, size - w))
                box = (x, y, x + w, y + h)
                if all(
                    box[2] + 8 <= b[0] or box[0] >= b[2] + 8
                    or box[3] + 8 <= b[1] or box[1] >= b[3] + 8
                    for b in (tuple(int(v * size) for v in bb) for bb in boxes)
                ):
                    placed = True
                    break
            if not placed:
                continue
            img[y : y + h, x : x + w] = np.minimum(
                img[y : y + h, x : x + w], patch_img
            )
        else:
            h = int(rng.integers(20, 60))
            w = int(rng.integers(80, 300))
            y = int(rng.integers(0, size - h))
            x = int(rng.integers(0, size - w))
            # formula-ish ink: dense bar with random gaps
            patch = (rng.random((h, w)) < 0.6).astype(np.uint8)
            img[y : y + h, x : x + w][patch > 0] = int(rng.integers(0, 60))
        boxes.append([x / size, y / size, (x + w) / size, (y + h) / size])
    return img, np.asarray(boxes, np.float32)


def window_sample(rng, style="hard"):
    """One 512x512 TRAINING WINDOW sampled from a big labelled page — the
    INFERENCE distribution (round-5 precision fix).

    ``--style mixed`` trains on whole 512 pages where every formula is
    fully visible; at inference the detector rolls 512 windows (stride
    128) over a 1280-wide page, so windows see formulas CLIPPED at their
    edges — a distribution the mixed soak never shows.  Round-4 page_eval
    read det-P 0.51 at recall 0.861: the FPs are window-edge partials and
    split boxes.  This sampler pastes page_eval-style pages (1024x1280,
    hard/structured renders) and cuts RANDOM-offset 512 windows with GT
    boxes clipped per ``window_targets`` (min_overlap 0.25, the ScanSSD
    ``gtdb_new.py`` convention) — windows holding a <25%-visible sliver
    get formula ink but NO box, the precision-critical negatives.

    Returns (windows u8 (W, 512, 512), gt (W, 8, 4), valid (W, 8)).
    """
    from doc2tex_tpu.detection.data import window_targets

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from page_eval import synth_labelled_page

    page_style = "hard" if rng.random() < 0.5 else "structured"
    n_regions = int(rng.integers(2, 9))
    page, boxes, _labels = synth_labelled_page(
        rng, n_regions=n_regions, style=page_style
    )
    H, W = page.shape
    k = 8
    info = [
        (int(rng.integers(0, W - 512 + 1)), int(rng.integers(0, H - 512 + 1)),
         512, 512)
        for _ in range(k)
    ]
    gt, valid = window_targets(
        np.asarray(boxes, np.float32).reshape(-1, 4), info, max_boxes=8
    )
    wins = np.stack([
        page[y0 : y0 + 512, x0 : x0 + 512] for x0, y0, _, _ in info
    ])
    return wins, gt, valid


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_eval", type=int, default=8)
    ap.add_argument("--save", default="/tmp/det_soak/last.msgpack",
                    help="checkpoint path for the trained SSD params "
                    "(exportable via tools/export_demo_weights.py)")
    ap.add_argument("--style", default="bars",
                    choices=["bars", "mixed", "windows"],
                    help="page region distribution (mixed = real formula "
                    "renders, the round-4 page_eval fix; windows = sliding-"
                    "window crops of big pages incl. clipped-formula "
                    "negatives, the round-5 precision fix)")
    ap.add_argument("--neg_frac", type=float, default=0.18,
                    help="windows style: fraction of the pool kept as "
                    "negative windows (no valid box — background or "
                    "sub-threshold slivers)")
    ap.add_argument("--init_from", default=None,
                    help="warm-start SSD params from a released weights "
                    "file (fine-tune instead of from-scratch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from doc2tex_tpu.detection import SSD512, batched_detect, make_priors
    from doc2tex_tpu.detection.data import make_detection_train_step
    from doc2tex_tpu.detection.evaluate import crohme_detection_scores
    from doc2tex_tpu.detection.priors import MATH_GTDB_512
    from doc2tex_tpu.detection.stitch import stitch_page

    rng = np.random.default_rng(0)
    model = SSD512(num_classes=2)
    t0 = time.time()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3), jnp.float32)
    )
    priors = jnp.asarray(make_priors())
    tx = optax.adam(1e-4)
    params = variables["params"]
    if args.init_from:
        from doc2tex_tpu.train.checkpoint import load_pretrained_params

        params, info = load_pretrained_params(args.init_from, params)
        print(f"warm-started from {args.init_from}: {info}", flush=True)
    opt_state = jax.jit(tx.init)(params)
    step = make_detection_train_step(model, priors, tx)
    print(f"init {time.time()-t0:.0f}s; params "
          f"{sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))/1e6:.1f}M",
          flush=True)

    MAXB = 8 if args.style == "windows" else 4
    mean_px = np.asarray(MATH_GTDB_512["mean_pixel"], np.float32)

    # device-resident pool (tunnel: per-step uploads are the bottleneck)
    N_POOL = 256
    imgs = np.empty((N_POOL, 512, 512, 3), np.float32)
    gts = np.zeros((N_POOL, MAXB, 4), np.float32)
    valid = np.zeros((N_POOL, MAXB), bool)
    if args.style == "windows":
        n_neg_target = int(round(args.neg_frac * N_POOL))
        n_pos = n_neg = i = 0
        while i < N_POOL:
            wins, wgt, wvalid = window_sample(rng)
            for w, g, v in zip(wins, wgt, wvalid):
                if i >= N_POOL:
                    break
                if v.any():
                    if n_pos >= N_POOL - n_neg_target:
                        continue
                    n_pos += 1
                else:
                    if n_neg >= n_neg_target:
                        continue
                    n_neg += 1
                imgs[i] = (np.repeat(w[..., None], 3, -1).astype(np.float32)
                           - mean_px)
                gts[i] = g
                valid[i] = v
                i += 1
        print(f"window pool: {n_pos} positive / {n_neg} negative windows, "
              f"{int(valid.sum())} boxes", flush=True)
    else:
        for i in range(N_POOL):
            img, boxes = synth_page(rng, style=args.style)
            imgs[i] = (np.repeat(img[..., None], 3, -1).astype(np.float32)
                       - mean_px)
            k = min(len(boxes), MAXB)
            gts[i, :k] = boxes[:k]
            valid[i, :k] = True
    t0 = time.time()
    imgs_d = jax.device_put(imgs)
    gts_d = jax.device_put(gts)
    valid_d = jax.device_put(valid)
    print(f"pool upload {imgs.nbytes/1e6:.0f}MB in {time.time()-t0:.0f}s",
          flush=True)

    B = args.batch

    @jax.jit
    def pool_step(params, opt_state, key, imgs_p, gts_p, valid_p):
        # pools ride as ARGS: closing over the 805MB device arrays embeds
        # them as constants in the traced module (remote-compile 413)
        key, sub = jax.random.split(key)
        idx = jax.random.randint(sub, (B,), 0, N_POOL)
        p, o, metrics = step(
            params, opt_state, imgs_p[idx], gts_p[idx], valid_p[idx]
        )
        return p, o, key, metrics["loss"]

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    first_loss = None
    for it in range(1, args.steps + 1):
        params, opt_state, key, loss = pool_step(
            params, opt_state, key, imgs_d, gts_d, valid_d
        )
        if it in (1, 10) or it % 100 == 0:
            lv = float(loss)
            first_loss = first_loss if first_loss is not None else lv
            print(f"[{it}] loss {lv:.4f} "
                  f"({it/max(time.time()-t0,1e-9):.1f} steps/s)", flush=True)
    final_loss = float(loss)
    print(f"loss: {first_loss:.3f} -> {final_loss:.3f}", flush=True)

    # held-out eval: detect -> stitch -> CROHME scores
    detect_j = jax.jit(
        lambda v, x, pr: batched_detect(
            *model.apply(v, x)[:2], pr, conf_thresh=0.3, iou_thresh=0.3
        )
    )
    detect = lambda v, x: detect_j(v, x, priors)
    preds, truths = [], []
    eval_rng = np.random.default_rng(99)
    if args.style == "windows":
        # held-out windows, scored per window (the page-level gate is
        # tools/page_eval.py --detect_weights, which runs the full
        # slide -> NMS -> crop -> recognize pipeline)
        n_done = 0
        while n_done < args.n_eval:
            wins, wgt, wvalid = window_sample(eval_rng)
            for w, g, v in zip(wins, wgt, wvalid):
                if n_done >= args.n_eval:
                    break
                x = jnp.asarray(
                    (np.repeat(w[..., None], 3, -1).astype(np.float32)
                     - mean_px)[None]
                )
                db, ds = detect({"params": params}, x)
                db, ds = np.asarray(db[0]) * 512, np.asarray(ds[0])
                keep = ds > 0.3
                preds.append(db[keep].reshape(-1, 4))
                truths.append(np.asarray(g[v], np.float32).reshape(-1, 4) * 512)
                n_done += 1
    else:
        for _ in range(args.n_eval):
            img, boxes = synth_page(eval_rng, style=args.style)
            x = jnp.asarray(
                (np.repeat(img[..., None], 3, -1).astype(np.float32)
                 - mean_px)[None]
            )
            db, ds = detect({"params": params}, x)
            db, ds = np.asarray(db[0]) * 512, np.asarray(ds[0])
            keep = ds > 0.3
            bs = np.concatenate([db[keep], ds[keep][:, None]], axis=1)
            stitched = stitch_page(bs, (512, 512), page_image=img,
                                   thresh_votes=0.5, algorithm="max")
            preds.append(np.asarray(stitched, np.float32).reshape(-1, 4))
            truths.append(boxes * 512)
    scores = crohme_detection_scores(preds, truths)
    print("CROHME scores:", scores, flush=True)

    if args.save:
        from types import SimpleNamespace

        from doc2tex_tpu.train.checkpoint import save_checkpoint

        save_checkpoint(
            args.save,
            SimpleNamespace(step=args.steps, params=params,
                            batch_stats={}, opt_state={}),
            {"iter": args.steps, "final_loss": final_loss, **scores},
        )
        print(f"saved {args.save}", flush=True)
    print("DETECTION SOAK DONE", flush=True)


if __name__ == "__main__":
    main()
