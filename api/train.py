"""Train CLI — same YAML surface as the reference ``api/train.py:113-174``.

Usage:
    python api/train.py --config config/train_synth.yaml
    python api/train.py --config config/train.yaml --resume_path saved_models/run/last_checkpoint.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="Path to config yaml file")
    parser.add_argument(
        "--resume_path", type=str, default=None,
        help="Path to checkpoint to continue training",
    )
    parser.add_argument(
        "--pretrained_weight", type=str, default=None,
        help="Checkpoint for partial (strict=False) init",
    )
    parser.add_argument(
        "--log_dir", type=str, default=None,
        help="Override the derived saved_models/<config-stem> log dir",
    )
    # accepted for reference CLI compatibility (bf16 is always on; grad
    # accumulation comes from the config's accum_grad)
    parser.add_argument("--amp", action="store_true", default=False)
    parser.add_argument("--accum-grad", action="store_true", default=False)
    parser.add_argument("--compile", action="store_true", default=False)
    parser.add_argument(
        "--platform", default=None, choices=["cpu", "tpu", "axon"],
        help="force a jax platform (the env may pin JAX_PLATFORMS, e.g. "
        "to a tunneled device; env vars are too late once jax imported — "
        "this applies jax.config.update post-import)",
    )
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from doc2tex_tpu.config import load_config
    from doc2tex_tpu.engine import train

    config = load_config(args.config)
    if args.resume_path:
        config["resume_path"] = args.resume_path
    if args.pretrained_weight:
        config["pretrained_weight"] = args.pretrained_weight

    # log-dir derivation mirrors reference api/train.py:161-171
    log_dir = args.log_dir or os.path.join(
        "saved_models", Path(args.config).stem
    )
    os.makedirs(log_dir, exist_ok=True)
    print("LOG DIR", log_dir)

    metrics = train(config, log_dir)
    print("final:", {k: v for k, v in metrics.items() if isinstance(v, (int, float))})


if __name__ == "__main__":
    main()
