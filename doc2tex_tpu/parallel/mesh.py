"""Device mesh + sharding rules (the multi-chip scaling layer).

The reference is single-process / single-device: its only nods to scale are
a vestigial ``batch_size * num_gpu`` multiply (reference ``api/train.py:
161-162``) and ``nn.DataParallel`` in the demo recognizer
(``demo/HybridViT/recog_flow.py:59-61``); there is no torch.distributed
anywhere (SURVEY.md section 2.10).

TPU-native design: a 2-axis ``jax.sharding.Mesh`` ``("data", "model")``.

- ``data``: batch-axis sharding — the throughput axis.  Every train/infer
  batch is sharded on its leading dim; XLA inserts the gradient ``psum``
  over ICI automatically when the loss is averaged.
- ``model``: tensor-parallel axis for large matmul weights.  At the
  reference model scale (~20M params) TP is not *needed* (SURVEY.md 2.10),
  but the rules here shard any >=2-D weight whose last dim divides the axis
  so the same code scales the model up without changes.

Everything is expressed as ``NamedSharding`` placements on arrays; the
train/infer steps are plain ``jax.jit`` programs whose shardings are
inferred from their inputs, with ``with_sharding_constraint`` used at
activation boundaries.  Collectives therefore ride ICI, chosen by XLA.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# --------------------------------------------------------------------------
# Activation-boundary constraints.
#
# Model code is mesh-agnostic; the engine (or a test) activates a mesh and
# layers call ``shard_activation(x, spec)`` at their boundaries.  With no
# active mesh this is an exact no-op, so single-device paths pay nothing.
# The constraint is baked in at trace time: create the jitted step *after*
# activating the mesh (the engine and dryrun both do).

_ACTIVATION_MESH: list[Mesh] = []


class activation_mesh:
    """Context manager: ``with activation_mesh(mesh): step = make_...()``."""

    def __init__(self, mesh: Optional[Mesh]):
        self.mesh = mesh

    def __enter__(self):
        if self.mesh is not None:
            _ACTIVATION_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        if self.mesh is not None:
            _ACTIVATION_MESH.pop()
        return False


def current_activation_mesh() -> Optional[Mesh]:
    return _ACTIVATION_MESH[-1] if _ACTIVATION_MESH else None


_DROP_WARNED: set = set()


def _warn_dropped_axes(spec, fixed, shape) -> None:
    """One-time (per spec/shape) diagnostic when a requested mesh axis is
    dropped because the dim isn't divisible — otherwise a TP boundary can
    quietly become replicated with no signal to the user."""
    key = (spec, fixed, tuple(shape))
    if key in _DROP_WARNED:
        return
    _DROP_WARNED.add(key)
    import logging

    logging.getLogger(__name__).warning(
        "shard_activation: dropped mesh axes %s for array shape %s "
        "(dim not divisible by mesh axis size); using %s",
        [a for a, b in zip(spec, fixed) if a != b], tuple(shape), fixed,
    )


def shard_activation(x: jax.Array, spec: Sequence[Optional[str]]) -> jax.Array:
    """Constrain an activation to ``spec`` over the active mesh (no-op when
    none).  Axis names in ``spec`` that the array dim doesn't divide are
    dropped (XLA would otherwise pad-reshard)."""
    mesh = current_activation_mesh()
    if mesh is None:
        return x
    fixed = tuple(
        a if (a is None or x.shape[i] % mesh.shape[a] == 0) else None
        for i, a in enumerate(spec)
    )
    if fixed != tuple(spec):
        _warn_dropped_axes(tuple(spec), fixed, x.shape)
    from jax.sharding import NamedSharding, PartitionSpec

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, PartitionSpec(*fixed))
    )


def make_mesh(
    mesh_shape: Optional[dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    ``mesh_shape`` e.g. ``{"data": 4, "model": 2}``; default puts every
    device on the data axis (the right default for this model scale).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape:
        nd = mesh_shape.get(DATA_AXIS, 1)
        nm = mesh_shape.get(MODEL_AXIS, 1)
        if nd * nm != n:
            raise ValueError(f"mesh {mesh_shape} != {n} devices")
    else:
        nd, nm = n, 1
    arr = mesh_utils.create_device_mesh((nd, nm), devices=devices)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: str, p, n_model: int, min_size: int) -> P:
    """Partition rule for one parameter.

    Tensor-parallel policy: shard the *output* (last) dim of big matmul
    weights over "model" — column-parallel linear layers; embeddings and
    vocab projections shard over the vocab dim.  Everything small (biases,
    norms, conv kernels below threshold) is replicated.
    """
    if n_model <= 1 or p.ndim < 2 or p.size < min_size:
        return P()
    if p.shape[-1] % n_model == 0:
        return P(*([None] * (p.ndim - 1) + [MODEL_AXIS]))
    if p.shape[-2] % n_model == 0:  # row-parallel fallback (e.g. ffn down-proj)
        return P(*([None] * (p.ndim - 2) + [MODEL_AXIS, None]))
    return P()


def param_shardings(params: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """NamedSharding pytree for a parameter pytree under ``mesh``."""
    n_model = mesh.shape[MODEL_AXIS]

    def rule(path, p):
        name = "/".join(str(k) for k in path)
        return NamedSharding(mesh, _param_spec(name, p, n_model, min_size))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """Place a parameter pytree onto the mesh per the TP rules."""
    shardings = param_shardings(params, mesh, min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch (numpy/jax arrays) with batch-axis sharding.

    Pads nothing: callers must supply a leading dim divisible by the data
    axis (the bucket batch planner guarantees this for full batches).
    """
    sh = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)
