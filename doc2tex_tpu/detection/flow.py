"""Full-page math detection flow.

Parity target: reference ``MathDetector`` + demo page pipeline
(``demo/ScanSSD/detect_flow.py:55-118``, ``demo/app.py:68-168``):
resize page to width 1280, roll 512x512 windows stride 128, mean-subtract
(246, 246, 246) + BGR order, batched SSD forward, per-window decode,
window->page coordinate unmap, page-level NMS IoU 0.1, 5% box expansion.

TPU-native: the SSD forward + decode + per-window NMS is one jitted
program over the whole window batch, and (``device_windows``, default)
the sliding windows are extracted ON DEVICE from a single uint8 page
upload — the host-side window batch shipped every page pixel ~16x
(overlapping 512x512 windows at stride 128) over the tunnel; the page
itself is ~1.3 MB.  Page dims are white-padded up to a 256-pixel ladder
so the compiled program set stays bounded across document heights.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .boxes import batched_detect, nms_fixed
from .priors import MATH_GTDB_512, make_priors
from .ssd import SSD512
from .windows import expand_boxes, rolling_windows, unmap_boxes


class MathDetector:
    """Page image -> math region boxes."""

    def __init__(
        self,
        variables=None,
        conf_thresh: float = 0.5,
        iou_thresh: float = 0.1,
        window: int = 512,
        stride: tuple[int, int] = (128, 128),
        batch_size: int = 32,
        seed: int = 0,
        weights_path: Optional[str] = None,
        device_windows: bool = True,
        mesh=None,
        quantize: Optional[str] = None,
        expand_frac: float = 0.05,
    ):
        """``mesh`` (a ``jax.sharding.Mesh``): shard the window batch over
        the mesh's ``data`` axis — multi-chip detection.  The window
        count is white-padded up to the data-axis size (white windows
        detect nothing above ``conf_thresh``; their rows are sliced off),
        so results are identical to single-device detection
        (``tests/test_parallel.py``)."""
        # quantize="bf16": run the SSD trunk in bfloat16 compute (params
        # stay f32; L2Norm accumulates f32).  The round-4 int8 arm LOST
        # 1.21x at SSD shapes (BASELINE.md detection section); bf16 is
        # the round-5 middle ground, A/B-gated on tools/page_eval.py.
        self.model = SSD512(
            num_classes=2,
            dtype=jnp.bfloat16 if quantize == "bf16" else jnp.float32,
        )
        self.priors = jnp.asarray(make_priors(MATH_GTDB_512))
        self.conf_thresh = conf_thresh
        self.iou_thresh = iou_thresh
        # box expansion before cropping (reference demo/app.py:103-116
        # expands 5%; sweepable — page_eval showed framing bounds EM)
        self.expand_frac = expand_frac
        self.window = window
        self.stride = stride
        self.mesh = mesh
        if mesh is not None:
            # host-window chunks pad to batch_size, so it must divide
            nd = int(mesh.shape["data"])
            batch_size = -(-batch_size // nd) * nd
        self.batch_size = batch_size
        if variables is None:
            dummy = jnp.zeros((1, window, window, 3), jnp.float32)
            # jitted: eager flax init is pathological on tunneled devices
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), dummy
            )
        if weights_path:
            from ..train.checkpoint import load_pretrained_variables

            params, stats, _info = load_pretrained_variables(
                weights_path, variables["params"],
                variables.get("batch_stats"),
            )
            variables = dict(variables, params=params)
            if stats is not None:
                variables["batch_stats"] = stats
        self.variables = variables
        self.device_windows = device_windows
        # priors as a jit ARG (not closure constant) keeps the serialized
        # module small enough for the remote-compile size limit
        jitted = jax.jit(self._detect_impl)
        self._detect = lambda v, x: jitted(v, x, self.priors)
        jitted_page = jax.jit(self._detect_page_impl)
        self._detect_full_page = lambda v, p: jitted_page(v, p, self.priors)
        # opt-in int8 detection (`quantize="int8"`): the SSD trunk's
        # 512-channel convs trace through ops/quant.py (shape-gated, like
        # the recognizer encoder).  Trace-time context — wrapping every
        # call is free after the first compile.
        from ..ops.quant import parts_for_mode, quantized_inference

        self.quant_parts = parts_for_mode(quantize)
        if self.quant_parts:
            def _q(fn):
                def inner(*a):
                    with quantized_inference(parts=self.quant_parts):
                        return fn(*a)
                return inner

            self._detect = _q(self._detect)
            self._detect_full_page = _q(self._detect_full_page)
        # page-level NMS runs jitted at a FIXED (cap, top_k) shape — eager
        # lax ops dispatch one-by-one over the tunnel (~2 s each), and a
        # per-page variable box count would force a fresh compile per page
        self._page_nms_cache: dict = {}
        self._nms_cap = 512

    def _page_nms(self, nb, ns, iou_thresh: Optional[float] = None):
        """Jitted page NMS, cached per IoU threshold — a custom ``nms_iou``
        must not fall back to eager ``nms_fixed`` (per-op tunnel dispatch,
        ~2 s/op; see the comment above)."""
        iou = self.iou_thresh if iou_thresh is None else float(iou_thresh)
        fn = self._page_nms_cache.get(iou)
        if fn is None:
            fn = jax.jit(partial(nms_fixed, iou_thresh=iou, top_k=200))
            self._page_nms_cache[iou] = fn
        return fn(nb, ns)

    def _shard_windows(self, x):
        """Constrain the window-batch axis over the mesh's data axis
        (no-op without a mesh; callers guarantee divisibility)."""
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, PartitionSpec("data"))
        )

    def _detect_impl(self, variables, x_u8, priors):
        # preprocess ON DEVICE: the host float32 3-channel version shipped
        # ~100 MB/chunk over the tunnel; uint8 grayscale is ~8 MB
        x = self._shard_windows(x_u8).astype(jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = x - jnp.asarray(MATH_GTDB_512["mean_pixel"], jnp.float32)
        loc, conf = self.model.apply(variables, x)
        # decode/NMS numerics stay f32 whatever the trunk compute dtype
        loc, conf = loc.astype(jnp.float32), conf.astype(jnp.float32)
        return batched_detect(
            loc, conf, priors,
            conf_thresh=self.conf_thresh, iou_thresh=self.iou_thresh,
        )

    def _grid(self, H: int, W: int) -> list[tuple[int, int, int, int]]:
        """The rolling-window origin grid: same [(x0, y0, w, h), ...] info
        list ``rolling_windows`` produces (windows.py:25-38)."""
        win, (sy, sx) = self.window, self.stride
        ny = max(math.ceil((H - win) / sy) + 1, 1)
        nx = max(math.ceil((W - win) / sx) + 1, 1)
        info = []
        for i in range(ny):
            for j in range(nx):
                x0, y0 = j * sx, i * sy
                info.append(
                    (x0, y0, min(x0 + win, W) - x0, min(y0 + win, H) - y0)
                )
        return info

    def _detect_page_impl(self, variables, page_u8, priors):
        """Window extraction ON DEVICE: one uint8 page upload instead of
        the ~16x-redundant host window batch.  The grid is static given
        the page shape; each window is a static slice center-padded with
        white exactly like ``rolling_windows`` (windows.py:30-38), so this
        path is bit-identical to the host extraction."""
        H, W = page_u8.shape[:2]
        win = self.window
        wins = []
        for x0, y0, w, h in self._grid(H, W):
            content = jax.lax.slice(
                page_u8, (y0, x0, 0), (y0 + h, x0 + w, page_u8.shape[2])
            )
            xc, yc = (win - w) // 2, (win - h) // 2
            wins.append(jnp.pad(
                content,
                ((yc, win - h - yc), (xc, win - w - xc), (0, 0)),
                constant_values=np.uint8(255),
            ))
        n = len(wins)
        if self.mesh is not None:
            # pad the window count so the batch axis shards evenly; pad
            # windows are all-white (no ink -> nothing above conf_thresh)
            # and their rows are sliced off below
            nd = int(self.mesh.shape["data"])
            wins += [jnp.full_like(wins[0], np.uint8(255))] * (-n % nd)
        boxes, scores = self._detect_impl(variables, jnp.stack(wins), priors)
        return boxes[:n], scores[:n]

    @staticmethod
    def _snap_page(page: np.ndarray, quantum: int = 256, min_dim: int = 512):
        """White-pad page dims up to the compile ladder (multiples of
        ``quantum``, at least the window size)."""
        H, W = page.shape[:2]
        Hp = max(min_dim, -(-H // quantum) * quantum)
        Wp = max(min_dim, -(-W // quantum) * quantum)
        if (Hp, Wp) == (H, W):
            return page
        pad = [(0, Hp - H), (0, Wp - W)] + (
            [(0, 0)] if page.ndim == 3 else []
        )
        return np.pad(page, pad, constant_values=255)

    def detect_page(
        self,
        page: np.ndarray,
        nms_iou: Optional[float] = None,
        raw: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Full pipeline: returns (boxes (K, 4) page pixels, scores (K,)).

        ``raw=True`` skips only the page-level NMS and its top-200 cap
        (per-window conf_thresh/NMS/top-k inside ``_detect`` still apply)
        — the input the voting stitch wants (stitch.py dedups by voting,
        so page-level truncation would silently drop low-score regions)."""
        H0, W0 = page.shape[:2]
        if self.device_windows:
            # ship the page once; extract windows on device.  The ladder
            # pad means detection runs on a white-extended page — window
            # contents near the original border differ from the unpadded
            # grid's center-padding, but boxes are clipped back below.
            padded = self._snap_page(page)
            if padded.ndim == 2:
                padded = padded[..., None]
            info = self._grid(*padded.shape[:2])
            boxes, scores = self._detect_full_page(
                self.variables, jnp.asarray(padded)
            )
            boxes, scores = np.asarray(boxes), np.asarray(scores)
        else:
            windows, info = rolling_windows(page, self.stride, self.window)
            all_boxes, all_scores = [], []
            B = self.batch_size
            for s in range(0, len(windows), B):
                chunk = windows[s : s + B]
                pad = B - len(chunk)
                if pad:
                    chunk = np.concatenate(
                        [chunk,
                         np.full((pad, *chunk.shape[1:]), 255, np.uint8)]
                    )
                b, sc = self._detect(self.variables, jnp.asarray(chunk))
                all_boxes.append(np.asarray(b)[: len(chunk) - pad or None])
                all_scores.append(np.asarray(sc)[: len(chunk) - pad or None])
            boxes = np.concatenate(all_boxes)
            scores = np.concatenate(all_scores)

        page_boxes, page_scores = unmap_boxes(
            boxes, scores, info, self.window, score_thresh=0.0
        )
        if self.device_windows and len(page_boxes):
            # clip to the ORIGINAL page and drop boxes living in the pad
            page_boxes[:, 0::2] = np.clip(page_boxes[:, 0::2], 0, W0)
            page_boxes[:, 1::2] = np.clip(page_boxes[:, 1::2], 0, H0)
            keep = (
                (page_boxes[:, 2] - page_boxes[:, 0] >= 2)
                & (page_boxes[:, 3] - page_boxes[:, 1] >= 2)
            )
            page_boxes, page_scores = page_boxes[keep], page_scores[keep]
        if raw or len(page_boxes) == 0:
            return page_boxes, page_scores
        # page-level NMS (reference demo/app.py:152, IoU 0.1)
        H, W = page.shape[:2]
        cap = self._nms_cap
        if len(page_boxes) > cap:  # keep the top-cap by score
            order = np.argsort(page_scores)[::-1][:cap]
            page_boxes, page_scores = page_boxes[order], page_scores[order]
        nb = np.zeros((cap, 4), np.float32)
        ns = np.zeros((cap,), np.float32)
        nb[: len(page_boxes)] = page_boxes / np.array([W, H, W, H], np.float32)
        ns[: len(page_scores)] = page_scores
        kb, ks = self._page_nms(
            jnp.asarray(nb), jnp.asarray(ns), iou_thresh=nms_iou
        )
        kb, ks = np.asarray(kb), np.asarray(ks)
        keep = ks > 0
        boxes = kb[keep] * np.array([W, H, W, H], np.float32)
        boxes = expand_boxes(boxes, (H, W), frac=self.expand_frac)
        return boxes, ks[keep]

    def crop_regions(self, page: np.ndarray, boxes: np.ndarray) -> list[np.ndarray]:
        """Crop detected regions (reference demo/app.py:163-165)."""
        out = []
        for x1, y1, x2, y2 in boxes.astype(int):
            out.append(page[y1:y2, x1:x2])
        return out
