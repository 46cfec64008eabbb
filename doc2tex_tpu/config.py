"""Configuration loading.

Keeps the same YAML surface as the reference (`config/train.yaml`,
`config/test.yaml` in the reference repo; see reference `api/train.py:113-174`
for how the flat-dict config is consumed) while layering defaults and light
validation on top.  The config object is a plain dict subclass so every
`config["key"]` / `config.get(key, default)` call site from the reference
surface keeps working.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

import yaml

# Defaults mirror the knobs the reference reads with .get(...) fallbacks
# scattered across api/train.py, doc2tex/engine/training.py and the data layer.
_DEFAULTS: dict[str, Any] = {
    "imgH": None,
    "imgW": None,
    "max_dimension": [800, 800],
    "min_dimension": [32, 32],
    "batch_max_length": 150,
    "keep_smaller_batches": True,
    "rgb": False,
    "mean": 0.5,
    "std": 0.5,
    "augment": False,
    "batch_size": 16,
    "workers": 0,
    "postprocess": False,
    "downsample": 1,
    "scale_factor": 32,
    "beam_size": 1,
    "token_level": "word",
    "accum_grad": 1,
    "pad": False,
    "sanity_check": False,
    "export_csv": False,
    "manualSeed": 1111,
    "grad_clip": 5.0,
    "valInterval": 5000,
    "logInterval": 100,
    "num_iter": 300000,
    "early_stop": 300000,
    "warmup_epochs": 5,
    "min_lr": 1e-5,
    "scheduler": True,
    "filter_bias_and_bn": True,
    "character": [],
    # TPU-specific knobs (no reference equivalent):
    "dtype": "bfloat16",          # compute dtype for matmuls
    "param_dtype": "float32",     # parameter storage dtype
    "mesh_shape": None,           # e.g. {"data": 8}; None = all devices on data
    "bucket_mode": "ladder",      # 'ladder' caps the compiled-shape count
    "bucket_growth": 1.5,         # ladder rung growth; raise to compile fewer shapes
}


class Config(dict):
    """Dict-like config with attribute sugar and deep-copied defaults."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - attr sugar
            raise AttributeError(name) from e

    def copy(self) -> "Config":
        return Config(copy.deepcopy(dict(self)))


def make_config(overrides: Mapping[str, Any] | None = None) -> Config:
    cfg = Config(copy.deepcopy(_DEFAULTS))
    if overrides:
        cfg.update(copy.deepcopy(dict(overrides)))
    return cfg


def load_config(path: str, **overrides: Any) -> Config:
    """Load a YAML config file (reference-format) and apply defaults."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    cfg = make_config(raw)
    cfg.update(overrides)
    _validate(cfg)
    return cfg


def _validate(cfg: Config) -> None:
    for key in ("max_dimension", "min_dimension"):
        dims = cfg.get(key)
        if dims is not None and len(dims) != 2:
            raise ValueError(f"{key} must be [H, W], got {dims!r}")
    sf = cfg.get("scale_factor", 32)
    for key in ("max_dimension", "min_dimension"):
        dims = cfg.get(key)
        if dims and any(d % sf for d in dims):
            raise ValueError(
                f"{key}={dims} must be divisible by scale_factor={sf}"
            )
