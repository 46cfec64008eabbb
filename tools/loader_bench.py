"""Host data-loader throughput bench (SURVEY §7 "data loading throughput").

The reference leans on torch DataLoader worker processes
(``doc2tex/data/builder.py:18``); our ``BucketLoader`` uses a thread pool
+ background prefetch.  A v5e-8 training at the measured ~204 img/s/chip
needs the host to sustain ~1.6k img/s — this bench measures what one host
core actually delivers through the full path:

    LMDB (PNG bytes) -> PIL decode -> grayscale -> downsample ->
    p=0.5 geometry augment -> bucket pad -> batch assemble -> tokenizer

Modes: augmented train epoch, augment-off epoch, and raw-decode floor
(dataset.image() only).  Prints one JSON line.

Usage: python tools/loader_bench.py [--n 2048] [--batch 32] [--workers N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--workers", type=int, default=0,
                    help="0 = single-thread assemble, -1 = cpu_count//2")
    ap.add_argument("--store", default=None,
                    help="reuse an existing LMDB store instead of building")
    args = ap.parse_args()

    import numpy as np

    from doc2tex_tpu.data.lmdb_reader import write_lmdb
    from doc2tex_tpu.data.loader import BucketLoader, LmdbDataset
    from doc2tex_tpu.data.synthetic import SYNTH_VOCAB, synth_structured_sample
    from doc2tex_tpu.tokenizer.converters import AttnLabelConverter

    store = args.store
    tmp = None
    if store is None:
        rng = np.random.default_rng(0)
        imgs, labels = [], []
        for _ in range(args.n):
            img, label = synth_structured_sample(rng)[:2]
            imgs.append(img)
            labels.append(label)
        tmp = tempfile.TemporaryDirectory()
        store = os.path.join(tmp.name, "bench.lmdb")
        t0 = time.perf_counter()
        write_lmdb(store, imgs, labels)
        build_s = time.perf_counter() - t0
        print(f"built {args.n}-sample store in {build_s:.1f}s", file=sys.stderr)

    ds = LmdbDataset(store, rgb=False)
    config = {
        "batch_size": args.batch,
        "batch_max_length": 150,
        "max_dimension": [448, 960],
        "min_dimension": [32, 32],
        "downsample": 1,
        "augment": True,
        "workers": args.workers,
        "keep_smaller_batches": True,
    }
    conv = AttnLabelConverter(SYNTH_VOCAB)

    def run_epoch(augment: bool, prefetch: int) -> tuple[float, int]:
        cfg = dict(config, augment=augment)
        loader = BucketLoader(ds, conv, cfg, train=True, prefetch=prefetch)
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += batch.images.shape[0]
        return time.perf_counter() - t0, n

    # warm epoch populates page caches
    run_epoch(augment=False, prefetch=0)

    dt_aug, n = run_epoch(augment=True, prefetch=2)
    dt_plain, _ = run_epoch(augment=False, prefetch=2)

    # raw decode floor: PIL PNG decode only
    t0 = time.perf_counter()
    for i in range(len(ds)):
        ds.image(i)
    dt_raw = time.perf_counter() - t0

    out = {
        "metric": f"loader images/sec (batch {args.batch}, "
                  f"workers {args.workers})",
        "value": round(n / dt_aug, 1),
        "unit": "images/sec",
        "augment_off": round(n / dt_plain, 1),
        "raw_decode_floor": round(len(ds) / dt_raw, 1),
        "samples": n,
    }
    print(json.dumps(out))
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
