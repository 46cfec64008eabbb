"""Attention visualization: decoder overlays + ViT attention rollout.

Parity targets (reference ``doc2tex/tools/interpretation/``):
- ``visualize_att`` (``visualization.py:67-216``): upsample per-token
  decoder alignments to the image size and blend a JET-style saliency map
  over the input.
- ``VITAttentionRollout`` (``vit_visualize.py:26-103``): collect per-block
  attention matrices (here via flax ``sow``/intermediates instead of torch
  forward hooks), fuse heads (mean/max/min), discard the lowest fraction,
  add identity (residual), normalize, and chain across blocks.
"""

from __future__ import annotations

from typing import Literal, Sequence

import numpy as np


def collect_vit_attention(model, variables, image) -> list[np.ndarray]:
    """Run the encoder capturing per-block attention probs.

    Returns [block_0 .. block_{L-1}] arrays (B, heads, N, N).
    """
    _, inter = model.apply(
        variables, image, method="encode", mutable=["intermediates"]
    )

    def walk(tree, out):
        if isinstance(tree, dict):
            for k, v in tree.items():
                if k == "attn_probs":
                    out.append(np.asarray(v[0], np.float32))
                else:
                    walk(v, out)

    maps: list[np.ndarray] = []
    walk(inter.get("intermediates", inter), maps)
    return maps


def attention_rollout(
    attentions: Sequence[np.ndarray],
    head_fusion: Literal["mean", "max", "min"] = "mean",
    discard_ratio: float = 0.9,
) -> np.ndarray:
    """Rollout (reference vit_visualize.py:51-88): returns the cls-token
    attention distribution over patches, (B, N-1), normalized to [0, 1]."""
    B, _, N, _ = attentions[0].shape
    result = np.broadcast_to(np.eye(N, dtype=np.float32), (B, N, N)).copy()
    for attn in attentions:
        if head_fusion == "mean":
            fused = attn.mean(axis=1)
        elif head_fusion == "max":
            fused = attn.max(axis=1)
        else:
            fused = attn.min(axis=1)
        # discard the lowest attention weights (but never the cls column)
        flat = fused.reshape(B, -1)
        k = int(flat.shape[1] * discard_ratio)
        if k > 0:
            idx = np.argpartition(flat, k, axis=1)[:, :k]
            for b in range(B):
                cols = idx[b][idx[b] % N != 0]
                flat[b, cols] = 0.0
        fused = flat.reshape(B, N, N)
        fused = fused + np.eye(N, dtype=np.float32)
        fused = fused / fused.sum(axis=-1, keepdims=True)
        result = np.einsum("bij,bjk->bik", fused, result)
    mask = result[:, 0, 1:]
    mx = mask.max(axis=-1, keepdims=True)
    return mask / np.maximum(mx, 1e-9)


def upsample_map(m: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-then-bilinear-ish upsample of a 2D saliency map."""
    h, w = m.shape
    H, W = out_hw
    yi = np.clip((np.arange(H) * h / H).astype(int), 0, h - 1)
    xi = np.clip((np.arange(W) * w / W).astype(int), 0, w - 1)
    return m[yi][:, xi]


def _jet(v: np.ndarray) -> np.ndarray:
    """Minimal JET colormap: v in [0,1] -> (..., 3) uint8."""
    r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def saliency_overlay(
    image: np.ndarray, attn_map: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Blend a saliency map over a grayscale image
    (reference VizTool.get_saliency_map, visualization.py:27-53)."""
    H, W = image.shape[:2]
    m = upsample_map(attn_map, (H, W))
    m = (m - m.min()) / max(m.max() - m.min(), 1e-9)
    heat = _jet(m)
    base = np.repeat(image[..., None], 3, axis=-1) if image.ndim == 2 else image
    return (alpha * heat + (1 - alpha) * base).astype(np.uint8)


def decoder_attention_maps(
    model, variables, image, tokens: np.ndarray, grid_hw: tuple[int, int],
    has_cls: bool = True,
) -> list[np.ndarray]:
    """Per-step decoder alignments reshaped to the 2D patch grid
    (reference visualize_att driving Model addition_outputs).

    ``tokens`` (T,) are the decode-step inputs (e.g. [GO] + prediction).
    Returns T maps of shape grid_hw.
    """
    import jax.numpy as jnp

    enc = model.apply(variables, image, method="encode")
    state = model.apply(variables, enc, len(tokens), method="init_decode_state")
    maps: list[np.ndarray] = []
    for t in range(len(tokens)):
        (state, _logits), inter = model.apply(
            variables, state, jnp.asarray(tokens[t : t + 1]),
            method="decode_step", mutable=["intermediates"],
        )

        def walk(tree, out):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    if k == "alpha":
                        out.append(np.asarray(v[0], np.float32))
                    else:
                        walk(v, out)

        found: list[np.ndarray] = []
        walk(inter.get("intermediates", inter), found)
        if not found:
            break
        alpha = found[-1][0]  # (S,)
        if has_cls and alpha.shape[0] == grid_hw[0] * grid_hw[1] + 1:
            alpha = alpha[1:]
        maps.append(alpha[: grid_hw[0] * grid_hw[1]].reshape(grid_hw))
    return maps


def select_samples(rows, condition: str | None = None, seed: int = 0):
    """Sample-selection condition DSL (reference ``get_test_sample``,
    ``interpretation/visualization.py:218-268`` + ``config.py:4-51``):
    conditions like ``"(len < 50 & len > 30)%iscorrect: True"`` filter
    prediction rows by token length and correctness.

    ``rows``: iterable of dicts with 'name', 'pred', 'label' and optional
    'iscorrect'.  Returns the matching rows (shuffled deterministically).
    """
    import random
    import re as _re

    rows = [dict(r, len=len(str(r.get("pred", "")).split())) for r in rows]
    if condition:
        m = _re.search(r"\((.*)\)", condition)
        if m:
            clauses = [c.strip() for c in m.group(1).split("&")]
            for clause in clauses:
                cm = _re.match(r"len\s*(<=|>=|<|>|==)\s*(\d+)", clause)
                if not cm:
                    continue
                op, val = cm.group(1), int(cm.group(2))
                ops = {
                    "<": lambda a, b: a < b, ">": lambda a, b: a > b,
                    "<=": lambda a, b: a <= b, ">=": lambda a, b: a >= b,
                    "==": lambda a, b: a == b,
                }[op]
                rows = [r for r in rows if ops(r["len"], val)]
        im = _re.search(r"%iscorrect:\s*(\w+)", condition)
        if im:
            want = im.group(1).lower() == "true"
            rows = [r for r in rows if bool(r.get("iscorrect", False)) == want]
    random.Random(seed).shuffle(rows)
    return rows


def collect_feature_maps(model, variables, image, name_filter=("ResNet", "Embed")):
    """Encoder/feature-extractor activation dumps (reference
    ``vit_visualize.py:158-229`` feature-map visualization): returns
    {module_path: array} for modules whose path matches ``name_filter``.
    Uses flax ``capture_intermediates`` instead of torch forward hooks."""

    def keep(mdl, method_name):
        return any(f in type(mdl).__name__ for f in name_filter)

    _, inter = model.apply(
        variables, image, method="encode", capture_intermediates=keep,
    )

    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        elif isinstance(tree, tuple):
            for i, v in enumerate(tree):
                if hasattr(v, "shape"):
                    out["/".join(path)] = np.asarray(v, np.float32)
                elif isinstance(v, tuple):
                    for vv in v:
                        if hasattr(vv, "shape"):
                            out["/".join(path)] = np.asarray(vv, np.float32)
                            break

    walk(inter.get("intermediates", inter), ())
    return out
