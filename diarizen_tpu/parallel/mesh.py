"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel training over NCCL
(SURVEY.md section 2.5). TPU-native equivalent: a ('data', 'model') mesh;
batches sharded over 'data' (XLA all-reduces gradients over ICI), and an
optional tensor-parallel 'model' axis for WavLM-Large where attention/FF
weight matrices are sharded (new capability vs the reference).

Everything here returns jax.sharding objects for use with jax.jit
in_shardings/out_shardings — no manual collectives; XLA inserts psum /
all-gather from the sharding propagation.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None) -> Mesh:
    """('data', 'model') mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree onto the mesh, batch axis over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def _is_model_parallel_path(path) -> bool:
    """True for WavLM transformer-layer matmul weights worth sharding over
    the 'model' axis (attention projections + FFN)."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    return ("layers" in keys) and any(k in ("attn", "ff") for k in keys)


def eend_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for EEND params.

    With n_model == 1 everything is replicated (pure DP — the reference's
    strategy). With n_model > 1, WavLM attention q/k/v and FF-in weights are
    column-sharded and out-proj / FF-out row-sharded over 'model'
    (Megatron-style; collectives ride ICI via XLA propagation).
    """
    n_model = mesh.shape["model"]

    def spec_for(path, leaf):
        if n_model == 1 or not _is_model_parallel_path(path):
            return NamedSharding(mesh, P())
        keys = [getattr(p, "key", None) for p in path]
        if leaf.ndim == 2:
            # q/k/v/ff-in: (d_in, d_out) -> shard d_out; out/ff-out: shard d_in
            if "out" in keys[-2:]:
                return NamedSharding(mesh, P("model", None))
            return NamedSharding(mesh, P(None, "model"))
        if leaf.ndim == 1 and "b" in keys[-1:] and "out" not in keys[-2:]:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)
