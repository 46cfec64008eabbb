"""Recognition serving CLI: HTTP front over the micro-batching server.

The reference's only serving surface is the Streamlit demo
(``demo/app.py:197-334``), which decodes one crop per interaction.  This
CLI is the production counterpart: a threaded stdlib HTTP server whose
handler threads block on futures while ONE dispatcher thread coalesces
concurrent requests into bucket-batched TPU decodes
(:class:`doc2tex_tpu.serving.RecognitionServer`).

Endpoints:
    GET  /                   browser demo UI (demo/web/index.html — the
                             stdlib replacement for the reference's
                             Streamlit app, reference demo/app.py:197-334)
    GET  /config             {"model_version": ..., "beam_size": ...,
                             "detect": bool} — UI capability probe
    POST /recognize          image bytes (png/jpg/bmp) -> {"latex": ...}
    POST /recognize_page     (--detect) page bytes ->
                             {"regions": [{"box": [x1,y1,x2,y2], "latex": ...}]}
    GET  /stats              dispatcher counters + latency percentiles
    GET  /healthz            liveness probe

With ``--detect``, detection runs page-by-page on a dedicated thread while
every page's crops flow through the SAME micro-batching crop dispatcher as
plain ``/recognize`` traffic (crops from concurrent pages share batches).

Usage:
    python api/serve.py --model_version synthetic --port 8080 \
        [--beam_size 5] [--max_batch 64] [--window_ms 5] [--platform cpu]

Load-generation smoke (no HTTP client needed):
    python api/serve.py --model_version synthetic --selftest 32
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def decode_image_bytes(data: bytes) -> np.ndarray:
    """Image file bytes -> grayscale uint8 HxW array."""
    from PIL import Image

    img = Image.open(io.BytesIO(data))
    return np.asarray(img.convert("L"), dtype=np.uint8)


UI_PATH = Path(__file__).resolve().parents[1] / "demo" / "web" / "index.html"


def build_handler(server, page_server=None, max_body: int = 32 << 20,
                  config_info: dict | None = None):
    """Bind a BaseHTTPRequestHandler subclass to a RecognitionServer
    (and, when detection is enabled, a PageServer)."""
    from doc2tex_tpu.serving import ServerOverloaded

    ui_html = UI_PATH.read_bytes() if UI_PATH.exists() else None
    cfg_payload = dict(config_info or {})
    cfg_payload.setdefault("detect", page_server is not None)

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            elif self.path == "/config":
                self._reply(200, cfg_payload)
            elif self.path in ("/", "/index.html") and ui_html is not None:
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header("Content-Length", str(len(ui_html)))
                self.end_headers()
                self.wfile.write(ui_html)
            elif self.path == "/stats":
                st = (
                    page_server.stats() if page_server is not None
                    else server.stats()
                )
                self._reply(200, st)
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):  # noqa: N802
            if self.path == "/recognize":
                handler = self._handle_crop
            elif self.path == "/recognize_page" and page_server is not None:
                handler = self._handle_page
            else:
                self._reply(404, {"error": "unknown path"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if not 0 < length <= max_body:
                self._reply(413, {"error": f"bad Content-Length {length}"})
                return
            data = self.rfile.read(length)
            t0 = time.monotonic()
            try:
                image = decode_image_bytes(data)
            except Exception as exc:  # noqa: BLE001
                self._reply(400, {"error": f"undecodable image: {exc}"})
                return
            try:
                payload = handler(image)
            except ServerOverloaded as exc:
                self._reply(503, {"error": str(exc)})
                return
            except Exception as exc:  # noqa: BLE001
                self._reply(500, {"error": str(exc)})
                return
            payload["ms"] = round((time.monotonic() - t0) * 1e3, 1)
            self._reply(200, payload)

        def _handle_crop(self, image) -> dict:
            return {"latex": server.recognize(image, timeout=120.0)}

        def _handle_page(self, image) -> dict:
            regions = page_server.recognize_page(image, timeout=300.0)
            return {
                "regions": [
                    {"box": [int(v) for v in box], "latex": latex}
                    for box, latex in regions
                ]
            }

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--recog_config", default=None,
                    help="recognizer config yaml (default demo/recog_cfg.yaml)")
    ap.add_argument("--model_version", default="synthetic",
                    help="version block in the recog config (shipped "
                    "releases: synthetic, synthetic_tfm, "
                    "synthetic_tfm_big)")
    ap.add_argument("--beam_size", type=int, default=None)
    ap.add_argument("--bf16", action="store_true",
                    help="disable the version block's `quantize:` mode "
                    "(released versions default to int8 — zero measured "
                    "EM cost, +24%% gate throughput)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--window_ms", type=float, default=5.0)
    ap.add_argument("--max_queue", type=int, default=512)
    ap.add_argument("--coalesce_ratio", type=float, default=None,
                    help="bucket-coalescing area-ratio guard: merge sparse "
                    "contained-bucket queues into one decode invocation "
                    "when the containing bucket's area is <= ratio x the "
                    "crop's native bucket (0/1 = shape-pure; default: the "
                    "model version block's `coalesce_ratio`, else off)")
    ap.add_argument("--detect", action="store_true",
                    help="enable POST /recognize_page: SSD detection per "
                    "page, crops routed through the shared crop dispatcher")
    ap.add_argument("--detect_weights", default=None,
                    help="SSD checkpoint (default: in-repo released "
                    "saved_models/math_detect weights)")
    ap.add_argument("--stitch", action="store_true",
                    help="voting-stitch page regions instead of NMS")
    ap.add_argument("--data_parallel", type=int, default=0, metavar="N",
                    help="shard every decode batch over the first N "
                    "visible devices (multi-chip serving; 0 = single "
                    "device)")
    ap.add_argument("--platform", default=None,
                    choices=["cpu", "tpu", "axon"],
                    help="force a jax platform (env JAX_PLATFORMS may be "
                    "pinned; this applies the post-import update)")
    ap.add_argument("--selftest", type=int, default=0, metavar="N",
                    help="skip HTTP: submit N synthetic crops to the "
                    "dispatcher open-loop and print stats")
    ap.add_argument("--selftest_rate", type=float, default=0.0,
                    metavar="RPS", help="pace selftest submissions at this "
                    "rate (0 = burst). A paced run below capacity measures "
                    "ONLINE latency; a burst p50 only measures queueing")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    try:
        # persistent compile cache: the dispatcher compiles one decode
        # program per (bucket, batch) shape as traffic ramps the batch
        # ladder — serve restarts should pay that only once per machine
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from doc2tex_tpu.recognition.flow import MathRecognition, load_recog_config
    from doc2tex_tpu.serving import RecognitionServer

    cfg, weights = load_recog_config(args.recog_config, args.model_version)
    if args.bf16:
        cfg["quantize"] = None
    mesh = None
    if args.data_parallel:
        from doc2tex_tpu.parallel import make_mesh

        mesh = make_mesh({"data": args.data_parallel, "model": 1},
                         devices=jax.devices()[: args.data_parallel])
    recog = MathRecognition(cfg, weights_path=weights,
                            beam_size=args.beam_size, mesh=mesh,
                            coalesce_ratio=args.coalesce_ratio)
    server = RecognitionServer(
        recog,
        max_batch=args.max_batch,
        batch_window_ms=args.window_ms,
        max_queue=args.max_queue,
        bucket_key=recog.bucket_key,  # shape-pure batches: one decode
        # invocation per dispatch instead of one per bucket in the mix
        # (with coalesce_ratio > 1, contained buckets merge too)
        coalesce_ratio=recog.coalesce_ratio,
    )

    page_server = None
    if args.detect:
        import demo.app as demo_app
        from doc2tex_tpu.serving import PageServer

        app = demo_app.App(
            detect_weights=args.detect_weights,
            use_detect=True,
            stitch=args.stitch,
            recognizer=recog,  # share the crop recognizer — one model copy
            detect_mesh=mesh,  # --data_parallel shards detection too
        )
        page_server = PageServer(app.detect_and_crop, server)

    if args.selftest:
        from doc2tex_tpu.data.synthetic import synth_sample

        rng = np.random.default_rng(0)
        crops = [synth_sample(rng)[0] for _ in range(args.selftest)]
        # open-loop load: submit everything up front (burst) or paced at
        # --selftest_rate, so the dispatcher actually coalesces (a closed
        # loop of N blocking threads caps every batch at N and measures
        # the load generator, not the server)
        t0 = time.monotonic()
        futures = []
        for i, c in enumerate(crops):
            if args.selftest_rate > 0:
                target = t0 + i / args.selftest_rate
                delay = target - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
            futures.append(server.submit(c))
        out = [f.result(timeout=1800.0) for f in futures]
        dt = time.monotonic() - t0
        stats = server.stats()
        if page_server is not None:
            # push a couple of synthetic "pages" through the page pipeline too
            pages = [
                np.full((640, 1280), 255, np.uint8) for _ in range(2)
            ]
            page_out = [
                page_server.recognize_page(p, timeout=600.0) for p in pages
            ]
            stats = page_server.stats()
            stats["selftest_pages"] = [len(r) for r in page_out]
            page_server.close()
        server.close()
        assert all(isinstance(s, str) for s in out)
        print(json.dumps({"selftest": args.selftest,
                          "wall_s": round(dt, 2), **stats}))
        return 0

    httpd = ThreadingHTTPServer(
        (args.host, args.port),
        build_handler(
            server,
            page_server=page_server,
            config_info={
                "model_version": args.model_version,
                "beam_size": int(recog.beam_size),
            },
        ),
    )
    print(f"serving {args.model_version} on http://{args.host}:{args.port} "
          f"(browser UI at /, beam={recog.beam_size}, "
          f"max_batch={args.max_batch}, window={args.window_ms}ms)",
          flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        if page_server is not None:
            page_server.close()
        server.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
