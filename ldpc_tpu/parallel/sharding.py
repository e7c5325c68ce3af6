"""SPMD evaluation and training over device meshes.

Shards the two embarrassingly-parallel axes of the workload — codeword batch
and Monte-Carlo trials/SNR points — across chips, with cross-chip
communication limited to scalar count/gradient reductions (inserted by XLA
from the sharding annotations; they ride ICI).  Decode iterations themselves
are chip-local: each chip holds whole codewords, so the QC message-passing
loop never communicates (the "lifted-graph edges stay chip-local" property
from BASELINE.json).

Determinism: data is generated *inside* jit from per-(snr, trial) folded
keys with JAX's partitionable threefry, so an N-chip run computes bit-
identical channel realizations to a 1-chip run — the N-host result is a
deterministic re-partition of the single-host result (SURVEY.md §7 hard
part 5), verified in tests/test_parallel.py.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldpc_tpu.ops.qc_msg import QCPlan
from ldpc_tpu.utils import channel as ch

Array = jax.Array


def _constrain_batch(x: Array, mesh: Mesh | None) -> Array:
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))


# ---------------------------------------------------------------------------
# Sharded Monte-Carlo evaluation
# ---------------------------------------------------------------------------


def make_mc_trial(
    decode_bits: Callable[[Array], Array],
    n: int,
    batch_size: int,
    mesh: Mesh | None = None,
    modulation: str = "qpsk",
    convention: str = "consistent",
    encoder=None,
):
    """Build a jitted MC trial: (key, snr_db) -> counts.

    Transmits all-zero codewords (the reference protocol, valid for
    sign-symmetric decoders) or, when an :class:`ldpc_tpu.codes.Encoder` is
    given, random codewords — required for honest evaluation of
    non-symmetric neural decoders (see codes/encoder.py).  ``decode_bits``
    maps (B, n) LLRs to (B, n) hard bits.  Returned counts are
    (bit_errors, frame_errors, bits, frames) scalars — `psum`-reduced
    across the mesh by XLA from the sharding annotations.
    """

    @jax.jit
    def trial(key, snr_db):
        if encoder is None:
            bits = jnp.zeros((batch_size, n))
            kc = key
        else:
            kb, kc = jax.random.split(key)
            bits = encoder.random_codewords(kb, batch_size)
        if modulation == "qpsk":
            llr = ch.qpsk_awgn_llr(kc, bits, snr_db, convention)
        else:
            llr = ch.bpsk_awgn_llr(kc, bits, snr_db)
        llr = _constrain_batch(llr, mesh)
        hard = decode_bits(llr)
        return ch.error_counts(bits, hard)

    return trial


def mc_sweep(
    decode_bits: Callable[[Array], Array],
    plan: QCPlan,
    snr_range,
    batch_size: int,
    num_trials: int,
    mesh: Mesh | None = None,
    seed: int = 4321,
    modulation: str = "qpsk",
    convention: str = "consistent",
    encoder=None,
) -> dict[str, list[float]]:
    """Sharded BER/FER sweep.  Returns {"snr", "ber", "fer"} lists.

    Capability parity with the reference's per-trial Python loops
    (`comparative_evaluation.py:108-166`, `trainer.py:202-262`) at any
    device count.
    """
    n = plan.C * plan.Z
    trial = make_mc_trial(decode_bits, n, batch_size, mesh, modulation, convention, encoder)
    base = jax.random.PRNGKey(seed)
    bers, fers = [], []
    ctx = mesh or _null_ctx()
    with ctx:
        for i, snr_db in enumerate(snr_range):
            be = fe = nb = nf = 0.0
            for t in range(num_trials):
                key = jax.random.fold_in(jax.random.fold_in(base, i), t)
                b, f, tb, tf = trial(key, jnp.float32(snr_db))
                be += float(b)
                fe += float(f)
                nb += float(tb)
                nf += float(tf)
            bers.append(be / nb)
            fers.append(fe / nf)
    return {"snr": [float(s) for s in snr_range], "ber": bers, "fer": fers}


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def shard_decode(decode_fn: Callable, mesh: Mesh, axis: str = "data") -> Callable:
    """SPMD-wrap a per-chip decode callable over the mesh's batch axis.

    The fused Pallas kernels (:mod:`ldpc_tpu.ops.pallas_minsum`,
    :mod:`ldpc_tpu.ops.pallas_gnn`, :mod:`ldpc_tpu.ops.pallas_neural`) are
    custom calls the XLA partitioner cannot split, so unlike the XLA decode
    path they cannot be auto-sharded via ``with_sharding_constraint`` —
    they must run *inside* ``shard_map``, each chip decoding its local
    batch shard.  Decode is embarrassingly parallel over frames (QC message
    passing never crosses frames), so no collectives are inserted.

    ``decode_fn``: (B_local, n) -> pytree of batch-leading arrays.  The
    global batch must divide by the axis size.
    """
    from jax.experimental.shard_map import shard_map

    f = shard_map(decode_fn, mesh=mesh, in_specs=P(axis), out_specs=P(axis),
                  check_rep=False)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# Sharded training step (data parallel + optional tensor parallel)
# ---------------------------------------------------------------------------


def tp_param_sharding(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel NamedShardings for a flax param tree.

    Dense kernels (2D) shard their output features over the 'model' axis;
    the paired biases and 1D weights replicate; type-embedding tables shard
    their hidden dim.  With model=1 this degrades to full replication.
    """

    m = mesh.shape["model"]

    def spec(path, x):
        names = [getattr(p, "key", str(p)) for p in path]
        shardable = x.ndim == 2 and names[-1] in ("kernel", "message_type_embeddings")
        if shardable and x.shape[1] % m == 0:  # e.g. (h, 1) projections replicate
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def make_sharded_train_step(
    model,
    plan: QCPlan,
    tx,
    mesh: Mesh,
    batch_size: int,
    modulation: str = "qpsk",
    convention: str = "consistent",
):
    """Jitted SPMD train step: (params, opt_state, key, snr) -> (params, opt_state, loss).

    Batch is sharded over 'data' (gradients all-reduced by XLA over ICI);
    params may be sharded over 'model' via :func:`tp_param_sharding`.
    """
    n = plan.C * plan.Z

    @jax.jit
    def step(params, opt_state, key, snr_db):
        kb, kc = jax.random.split(key)
        bits = jax.random.bernoulli(kb, 0.5, (batch_size, n)).astype(jnp.float32)
        bits = _constrain_batch(bits, mesh)
        if modulation == "qpsk":
            llr = ch.qpsk_awgn_llr(kc, bits, snr_db, convention)
        else:
            llr = ch.bpsk_awgn_llr(kc, bits, snr_db)
        llr = _constrain_batch(llr, mesh)

        def loss_fn(p):
            _, loss = model.apply(p, llr, plan, bits)
            return loss.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    return step
