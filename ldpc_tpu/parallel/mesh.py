"""Device mesh construction and multi-host initialization.

The reference has no distributed layer at all (SURVEY.md §2: no
torch.distributed / NCCL / MPI anywhere; single ``device`` string end to
end).  This module provides the TPU-native equivalent mandated by
BASELINE.json: `jax.sharding.Mesh` construction over chips (and hosts via
`jax.distributed`), with collectives expressed through shardings rather
than an explicit NCCL-like API.  Lifted-graph edges stay chip-local under
the batch/SNR shardings in :mod:`ldpc_tpu.parallel.sharding`, so decode
iterations need no cross-chip traffic.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def distributed_init(coordinator_address: str | None = None, **kw) -> None:
    """Initialize multi-host JAX.

    Idempotent (a second call on an already-initialized runtime is a no-op)
    but otherwise loud: a real initialization failure (bad coordinator
    address, mismatched process count, dead peer) propagates instead of
    silently degrading to single-process.  Exercised for real by
    tools/multihost_launch.py / tests/test_multiprocess.py.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kw)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.

    Defaults to all visible devices on the data axis — pure data parallelism,
    the natural scaling axis for Monte-Carlo BER/FER sweeps and SNR-mixed
    training.  ``model > 1`` carves a tensor-parallel axis for the GNN MLPs.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if data is None:
        data = devices.size // model
    if data * model != devices.size:
        raise ValueError(f"mesh {data}x{model} != {devices.size} devices")
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, ...) arrays: batch split over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
