"""Serving layer tests: micro-batching dispatcher + HTTP front.

The reference has no serving surface beyond the Streamlit demo callback
(one crop per interaction, ``demo/app.py:182-194``); the batching
semantics tested here are this framework's production addition.
"""

import io
import json
import threading
import time
from http.client import HTTPConnection
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from doc2tex_tpu.serving import (
    PageServer,
    RecognitionServer,
    ServerClosed,
    ServerOverloaded,
)


class FakeRecognizer:
    """Batch callable that labels images by their [0,0] pixel and records
    the batch sizes it was called with."""

    def __init__(self, delay_s: float = 0.0, gate: threading.Event = None):
        self.batches = []
        self.delay_s = delay_s
        self.gate = gate
        self.entered = threading.Event()  # set when a batch call begins

    def __call__(self, images):
        self.entered.set()
        if self.gate is not None:
            self.gate.wait(timeout=10.0)
        if self.delay_s:
            time.sleep(self.delay_s)
        self.batches.append(len(images))
        return [f"px{int(np.asarray(im)[0, 0])}" for im in images]


class TestDispatcher:
    def test_results_map_to_requests(self):
        recog = FakeRecognizer()
        with RecognitionServer(recog, batch_window_ms=20) as srv:
            imgs = [np.full((4, 4), v, np.uint8) for v in range(17)]
            out = srv.recognize_many(imgs, timeout=10.0)
        assert out == [f"px{v}" for v in range(17)]

    def test_concurrent_requests_coalesce(self):
        # Deterministic coalescing: the gate holds the dispatcher inside
        # batch #1 while 7 more requests queue up; releasing it must yield
        # exactly one more batch with all 7.
        gate = threading.Event()
        recog = FakeRecognizer(gate=gate)
        srv = RecognitionServer(recog, max_batch=64, batch_window_ms=0)
        try:
            first = srv.submit(np.zeros((4, 4), np.uint8))
            assert recog.entered.wait(timeout=5.0)  # dispatcher is inside #1
            rest = [srv.submit(np.full((4, 4), v, np.uint8)) for v in range(1, 8)]
            gate.set()
            assert first.result(timeout=10.0) == "px0"
            assert [f.result(timeout=10.0) for f in rest] == [
                f"px{v}" for v in range(1, 8)
            ]
        finally:
            srv.close()
        assert recog.batches[0] == 1
        assert recog.batches[1] == 7  # coalesced, not 7 batch-1 calls
        st = srv.stats()
        assert st["completed"] == 8 and st["batches"] == 2
        assert st["avg_batch"] == 4.0

    def test_max_batch_cap(self):
        gate = threading.Event()
        recog = FakeRecognizer(gate=gate)
        srv = RecognitionServer(recog, max_batch=3, batch_window_ms=0)
        try:
            futures = [
                srv.submit(np.full((2, 2), v, np.uint8)) for v in range(10)
            ]
            gate.set()
            for v, f in enumerate(futures):
                assert f.result(timeout=10.0) == f"px{v}"
        finally:
            srv.close()
        assert max(recog.batches) <= 3

    def test_backpressure(self):
        gate = threading.Event()
        recog = FakeRecognizer(gate=gate)
        srv = RecognitionServer(recog, max_queue=2, batch_window_ms=0)
        try:
            held = srv.submit(np.zeros((2, 2), np.uint8))  # occupies dispatcher
            assert recog.entered.wait(timeout=5.0)
            srv.submit(np.zeros((2, 2), np.uint8))
            srv.submit(np.zeros((2, 2), np.uint8))
            with pytest.raises(ServerOverloaded):
                srv.submit(np.zeros((2, 2), np.uint8))
            gate.set()
            held.result(timeout=10.0)
        finally:
            srv.close()

    def test_recognizer_error_propagates_and_server_survives(self):
        calls = {"n": 0}

        def flaky(images):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("boom")
            return ["ok"] * len(images)

        with RecognitionServer(flaky, batch_window_ms=0) as srv:
            bad = srv.submit(np.zeros((2, 2), np.uint8))
            with pytest.raises(ValueError, match="boom"):
                bad.result(timeout=10.0)
            assert srv.recognize(np.zeros((2, 2), np.uint8), timeout=10.0) == "ok"
            st = srv.stats()
            assert st["errors"] == 1 and st["completed"] == 1

    def test_submit_after_close_raises(self):
        srv = RecognitionServer(FakeRecognizer(), batch_window_ms=0)
        srv.close()
        with pytest.raises(ServerClosed):
            srv.submit(np.zeros((2, 2), np.uint8))

    def test_close_drains_queue(self):
        recog = FakeRecognizer(delay_s=0.01)
        srv = RecognitionServer(recog, batch_window_ms=0)
        futures = [srv.submit(np.full((2, 2), v, np.uint8)) for v in range(5)]
        srv.close(drain=True)
        assert [f.result(timeout=1.0) for f in futures] == [
            f"px{v}" for v in range(5)
        ]

    def test_stats_shape(self):
        with RecognitionServer(FakeRecognizer(), batch_window_ms=0) as srv:
            srv.recognize(np.zeros((2, 2), np.uint8), timeout=10.0)
            st = srv.stats()
        for key in ("requests", "completed", "batches", "errors",
                    "queue_depth", "avg_batch", "latency_p50_ms",
                    "latency_p95_ms", "throughput_rps", "uptime_s"):
            assert key in st, key
        assert st["latency_p50_ms"] > 0


class TestBucketAwareDispatch:
    def test_batches_are_shape_pure(self):
        # Interleaved shapes queue behind a gated warmup; on release the
        # dispatcher must emit shape-pure batches (oldest bucket first),
        # not one mixed batch.
        gate = threading.Event()
        shapes_seen = []

        class ShapeRecognizer(FakeRecognizer):
            def __call__(self, images):
                shapes_seen.append({im.shape for im in images})
                return super().__call__(images)

        recog = ShapeRecognizer(gate=gate)
        srv = RecognitionServer(
            recog, max_batch=64, batch_window_ms=0,
            bucket_key=lambda im: im.shape,
        )
        try:
            warm = srv.submit(np.zeros((2, 2), np.uint8))
            assert recog.entered.wait(timeout=5.0)
            futs = []
            for v in range(12):
                shape = (4, 4) if v % 2 == 0 else (8, 8)
                futs.append(srv.submit(np.full(shape, v, np.uint8)))
            gate.set()
            assert warm.result(timeout=10.0) == "px0"
            assert [f.result(timeout=10.0) for f in futs] == [
                f"px{v}" for v in range(12)
            ]
        finally:
            srv.close()
        # every dispatched batch contains exactly one shape
        assert all(len(s) == 1 for s in shapes_seen)
        # the 12 queued crops needed only 2 batches (6 + 6), not 12
        assert recog.batches[1:] == [6, 6]

    def test_oldest_bucket_goes_first_and_none_starve(self):
        gate = threading.Event()
        recog = FakeRecognizer(gate=gate)
        srv = RecognitionServer(
            recog, max_batch=4, batch_window_ms=0,
            bucket_key=lambda im: im.shape,
        )
        try:
            warm = srv.submit(np.zeros((2, 2), np.uint8))
            assert recog.entered.wait(timeout=5.0)
            # rare bucket first, then a flood of another bucket
            rare = srv.submit(np.full((16, 16), 9, np.uint8))
            flood = [
                srv.submit(np.full((4, 4), v, np.uint8)) for v in range(8)
            ]
            gate.set()
            assert warm.result(timeout=10.0) == "px0"
            assert rare.result(timeout=10.0) == "px9"
            assert [f.result(timeout=10.0) for f in flood] == [
                f"px{v}" for v in range(8)
            ]
        finally:
            srv.close()
        # rare singleton dispatched before the flood (it is oldest)
        assert recog.batches[1] == 1
        assert max(recog.batches) <= 4

    def test_recognizer_bucket_key_matches_internal_grouping(self):
        from tests.test_loader_engine import small_config
        from doc2tex_tpu.recognition.flow import MathRecognition
        from doc2tex_tpu.data.synthetic import synth_sample

        cfg = small_config()
        recog = MathRecognition(cfg, beam_size=1, use_clahe=False)
        rng = np.random.default_rng(7)
        for _ in range(20):
            crop, _ = synth_sample(rng)
            img = recog._preprocess(crop)
            bucket = recog.table.lookup(*img.shape[:2])
            if bucket is None:
                bucket = recog.table.shapes[-1]
            assert recog.bucket_key(crop) == bucket


class TestCoalescedDispatch:
    """Bucket coalescing (round-4): contained buckets share a dispatch
    batch within the area-ratio guard, and the recognizer collapses the
    mixed batch into ONE decode invocation."""

    def _mixed_run(self, ratio, shapes, max_batch=64):
        gate = threading.Event()
        recog = FakeRecognizer(gate=gate)
        srv = RecognitionServer(
            recog, max_batch=max_batch, batch_window_ms=0,
            bucket_key=lambda im: im.shape, coalesce_ratio=ratio,
        )
        try:
            warm = srv.submit(np.zeros((2, 2), np.uint8))
            assert recog.entered.wait(timeout=5.0)
            futs = [
                srv.submit(np.full(s, v, np.uint8))
                for v, s in enumerate(shapes)
            ]
            gate.set()
            assert warm.result(timeout=10.0) == "px0"
            assert [f.result(timeout=10.0) for f in futs] == [
                f"px{v}" for v in range(len(shapes))
            ]
        finally:
            srv.close()
        return recog.batches[1:]

    def test_contained_buckets_merge_within_ratio(self):
        # (8,8) area 64 == 4.0 x (4,4) area 16 -> one mixed batch
        shapes = [(4, 4) if v % 2 == 0 else (8, 8) for v in range(12)]
        assert self._mixed_run(4.0, shapes) == [12]

    def test_ratio_guard_keeps_far_buckets_apart(self):
        # (16,16) area 256 > 4.0 x (4,4) area 16 -> stays shape-pure
        shapes = [(4, 4) if v % 2 == 0 else (16, 16) for v in range(12)]
        assert sorted(self._mixed_run(4.0, shapes)) == [6, 6]

    def test_incomparable_buckets_never_merge(self):
        # neither (4,16) nor (8,8) contains the other
        shapes = [(4, 16) if v % 2 == 0 else (8, 8) for v in range(8)]
        assert sorted(self._mixed_run(100.0, shapes)) == [4, 4]

    def test_ratio_off_is_shape_pure(self):
        shapes = [(4, 4) if v % 2 == 0 else (8, 8) for v in range(12)]
        assert sorted(self._mixed_run(0.0, shapes)) == [6, 6]

    def test_coalesce_groups_unit(self):
        from doc2tex_tpu.recognition.flow import coalesce_groups

        groups = {(32, 64): [0, 1], (64, 128): [2], (32, 320): [3]}
        out = coalesce_groups(groups, ratio=4.0)
        # (32,64) area 2048 merges into (64,128) area 8192 (= 4.0x);
        # (32,320) is incomparable with (64,128) and stays
        assert out == {(64, 128): [2, 0, 1], (32, 320): [3]}
        # ratio off = identity
        assert coalesce_groups(groups, 0.0) == groups
        # guard: 8192 > 2 x 2048 -> no merge
        out2 = coalesce_groups({(32, 64): [0], (64, 128): [1]}, 2.0)
        assert out2 == {(64, 128): [1], (32, 64): [0]}

    def test_recognizer_single_invocation_for_mixed_batch(self):
        from tests.test_loader_engine import small_config
        from doc2tex_tpu.recognition.flow import MathRecognition

        cfg = small_config()
        recog = MathRecognition(
            cfg, beam_size=1, use_clahe=False, coalesce_ratio=1e9
        )
        calls = []
        real = recog._decode_fn()

        def spy(variables, batch):
            calls.append(batch.shape)
            return real(variables, batch)

        recog._decode_cache[recog.beam_size] = spy
        rng = np.random.default_rng(3)
        crops = [
            (rng.random((h, w)) * 255).astype(np.uint8)
            for h, w in [(20, 30), (40, 90), (22, 60), (60, 120)]
        ]
        keys = {recog.bucket_key(c) for c in crops}
        assert len(keys) > 1  # the workload really is multi-bucket
        out = recog(crops)
        assert len(out) == len(crops)
        assert len(calls) == 1  # coalesced into one decode invocation
        # without coalescing the same traffic fragments per bucket
        recog2 = MathRecognition(cfg, beam_size=1, use_clahe=False)
        calls2 = []
        real2 = recog2._decode_fn()

        def spy2(variables, batch):
            calls2.append(batch.shape)
            return real2(variables, batch)

        recog2._decode_cache[recog2.beam_size] = spy2
        recog2(crops)
        assert len(calls2) == len(keys)


def fake_detect_and_crop(page):
    """Deterministic stand-in for App.detect_and_crop: one crop per
    distinct value v in row 0, each crop an (8,8) field of v."""
    values = sorted(set(int(v) for v in np.asarray(page)[0]))
    boxes = [(v, 0, v + 8, 8) for v in values]
    crops = [np.full((8, 8), v, np.uint8) for v in values]
    return boxes, crops


class TestPageServer:
    def test_page_regions_roundtrip(self):
        recog = FakeRecognizer()
        with RecognitionServer(recog, batch_window_ms=5) as crop_srv:
            ps = PageServer(fake_detect_and_crop, crop_srv)
            page = np.zeros((4, 16), np.uint8)
            page[0, :8] = 3
            page[0, 8:] = 9
            out = ps.recognize_page(page, timeout=10.0)
            ps.close()
        assert out == [((3, 0, 11, 8), "px3"), ((9, 0, 17, 8), "px9")]

    def test_pages_share_crop_batches(self):
        # Hold the dispatcher inside a warmup batch while two pages' crops
        # queue up; on release they must coalesce into one decode batch.
        gate = threading.Event()
        recog = FakeRecognizer(gate=gate)
        crop_srv = RecognitionServer(recog, max_batch=64, batch_window_ms=0)
        try:
            warm = crop_srv.submit(np.zeros((2, 2), np.uint8))
            assert recog.entered.wait(timeout=5.0)
            ps = PageServer(fake_detect_and_crop, crop_srv)
            pages = []
            for base in (10, 20):
                page = np.zeros((4, 16), np.uint8)
                page[0, :8] = base
                page[0, 8:] = base + 1
                pages.append(ps.submit_page(page))
            # wait until both pages' crops are queued behind the gate
            deadline = time.monotonic() + 5.0
            while crop_srv.stats()["queue_depth"] < 4:
                assert time.monotonic() < deadline
                time.sleep(0.002)
            gate.set()
            assert warm.result(timeout=10.0) == "px0"
            assert [lx for _, lx in pages[0].result(timeout=10.0)] == [
                "px10", "px11"
            ]
            assert [lx for _, lx in pages[1].result(timeout=10.0)] == [
                "px20", "px21"
            ]
            ps.close()
        finally:
            crop_srv.close()
        # batch #1 = warmup alone; batch #2 = all four crops coalesced
        assert recog.batches == [1, 4]

    def test_empty_page(self):
        with RecognitionServer(FakeRecognizer(), batch_window_ms=0) as crop_srv:
            ps = PageServer(lambda page: ([], []), crop_srv)
            assert ps.recognize_page(np.zeros((4, 4), np.uint8),
                                     timeout=10.0) == []
            assert ps.stats()["pages"] == 1
            ps.close()

    def test_detect_error_propagates(self):
        def boom(page):
            raise RuntimeError("detector exploded")

        with RecognitionServer(FakeRecognizer(), batch_window_ms=0) as crop_srv:
            ps = PageServer(boom, crop_srv)
            with pytest.raises(RuntimeError, match="detector exploded"):
                ps.recognize_page(np.zeros((4, 4), np.uint8), timeout=10.0)
            ps.close()

    def test_crop_error_propagates_to_page(self):
        def flaky(images):
            raise ValueError("decode failed")

        with RecognitionServer(flaky, batch_window_ms=0) as crop_srv:
            ps = PageServer(fake_detect_and_crop, crop_srv)
            page = np.zeros((4, 8), np.uint8)
            page[0, :] = 5
            with pytest.raises(ValueError, match="decode failed"):
                ps.recognize_page(page, timeout=10.0)
            ps.close()

    def test_submit_after_close_raises(self):
        with RecognitionServer(FakeRecognizer(), batch_window_ms=0) as crop_srv:
            ps = PageServer(fake_detect_and_crop, crop_srv)
            ps.close()
            with pytest.raises(ServerClosed):
                ps.submit_page(np.zeros((2, 2), np.uint8))
            # closing the page server leaves the shared crop server usable
            assert crop_srv.recognize(
                np.zeros((2, 2), np.uint8), timeout=10.0
            ) == "px0"


class TestHTTPFront:
    @pytest.fixture()
    def http_server(self):
        import sys, os  # noqa: E401

        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "api",
            ),
        )
        from serve import build_handler

        recog = FakeRecognizer()
        srv = RecognitionServer(recog, batch_window_ms=5)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), build_handler(srv))
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield httpd.server_address[1], recog
        httpd.shutdown()
        srv.close()

    @staticmethod
    def _png_bytes(value: int) -> bytes:
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(np.full((8, 8), value, np.uint8)).save(buf, "PNG")
        return buf.getvalue()

    def test_recognize_roundtrip(self, http_server):
        port, _ = http_server
        conn = HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/recognize", body=self._png_bytes(37))
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 200
        assert body["latex"] == "px37"
        assert body["ms"] >= 0

    def test_concurrent_posts_share_batches(self, http_server):
        port, recog = http_server
        results = [None] * 12

        def post(i):
            conn = HTTPConnection("127.0.0.1", port, timeout=15)
            payload = self._png_bytes(i)
            conn.request("POST", "/recognize", body=payload)
            results[i] = json.loads(conn.getresponse().read())["latex"]

        threads = [threading.Thread(target=post, args=(i,)) for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results == [f"px{i}" for i in range(12)]

    def test_stats_and_health(self, http_server):
        port, _ = http_server
        conn = HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["ok"] is True
        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert "requests" in st
        conn.request("GET", "/nope")
        assert conn.getresponse().status == 404

    def test_browser_ui_served_at_root(self, http_server):
        # GET / serves demo/web/index.html — the stdlib replacement for
        # the reference's Streamlit demo (reference demo/app.py:197-334)
        port, _ = http_server
        conn = HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/")
        resp = conn.getresponse()
        body = resp.read().decode()
        assert resp.status == 200
        assert resp.getheader("Content-Type").startswith("text/html")
        # the page drives the same production endpoints as API clients
        assert "/recognize" in body and "/config" in body
        conn.request("GET", "/index.html")
        assert conn.getresponse().status == 200

    def test_config_endpoint(self, http_server):
        port, _ = http_server
        conn = HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/config")
        cfg = json.loads(conn.getresponse().read())
        assert cfg["detect"] is False  # no PageServer in this fixture

    def test_bad_image_is_400(self, http_server):
        port, _ = http_server
        conn = HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/recognize", body=b"not an image")
        assert conn.getresponse().status == 400

    def test_recognize_page_404_without_detect(self, http_server):
        port, _ = http_server
        conn = HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/recognize_page", body=self._png_bytes(1))
        assert conn.getresponse().status == 404


class TestHTTPPageFront:
    @pytest.fixture()
    def http_server(self):
        import sys, os  # noqa: E401

        sys.path.insert(
            0,
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "api",
            ),
        )
        from serve import build_handler

        recog = FakeRecognizer()
        srv = RecognitionServer(recog, batch_window_ms=5)
        ps = PageServer(fake_detect_and_crop, srv)
        httpd = ThreadingHTTPServer(
            ("127.0.0.1", 0),
            build_handler(
                srv, page_server=ps,
                config_info={"model_version": "fake", "beam_size": 3},
            ),
        )
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield httpd.server_address[1]
        httpd.shutdown()
        ps.close()
        srv.close()

    def test_page_roundtrip(self, http_server):
        from PIL import Image

        page = np.zeros((8, 16), np.uint8)
        page[0, :8] = 4
        page[0, 8:] = 7
        buf = io.BytesIO()
        Image.fromarray(page).save(buf, "PNG")
        conn = HTTPConnection("127.0.0.1", http_server, timeout=15)
        conn.request("POST", "/recognize_page", body=buf.getvalue())
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 200
        assert body["regions"] == [
            {"box": [4, 0, 12, 8], "latex": "px4"},
            {"box": [7, 0, 15, 8], "latex": "px7"},
        ]
        # /stats now reports the page-server shape
        conn.request("GET", "/stats")
        st = json.loads(conn.getresponse().read())
        assert st["pages"] == 1 and st["regions"] == 2
        assert "requests" in st["crop_server"]

    def test_config_reports_detect_and_model(self, http_server):
        conn = HTTPConnection("127.0.0.1", http_server, timeout=10)
        conn.request("GET", "/config")
        cfg = json.loads(conn.getresponse().read())
        assert cfg == {
            "model_version": "fake", "beam_size": 3, "detect": True,
        }


class TestEndToEndTinyModel:
    def test_server_over_real_recognizer(self):
        # tiny model, greedy decode, CPU — exercises the full submit ->
        # dispatch -> bucket-batch -> decode -> detokenize path
        from tests.test_loader_engine import small_config
        from doc2tex_tpu.recognition.flow import MathRecognition
        from doc2tex_tpu.data.synthetic import synth_sample

        cfg = small_config()
        recog = MathRecognition(cfg, beam_size=1, use_clahe=False)
        rng = np.random.default_rng(3)
        crops = [synth_sample(rng)[0] for _ in range(3)]
        with RecognitionServer(recog, batch_window_ms=50) as srv:
            out = srv.recognize_many(crops, timeout=300.0)
        assert len(out) == 3
        assert all(isinstance(s, str) for s in out)
