"""Headline benchmark: decoded bits/s/chip, min-sum + message-GNN, 20 iterations.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "details"}.

Baseline (vs_baseline denominator): the reference PyTorch
``MinSumScaledDecoder`` (`models/traditional_decoders.py:137-285`) measured
on NR_2_0_32 (Z=32), batch 32 (its own eval protocol batch,
`comparative_evaluation.py:42`), 20 iterations, no early stop, CPU:
666.43 bits/s (79.9 s per batch; measured 2026-08-17 on this machine —
the reference publishes no numbers, BASELINE.md).
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp

REF_BITS_PER_S = 666.43

CODE = "nr_2_0_32"
Z = 32
ITERS = 20
MINSUM_BATCH = 65536
GNN_BATCH = 512
GNN_HIDDEN = 64


def main() -> None:
    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.classical import decode_min_sum
    from ldpc_tpu.models.message_gnn import create_message_gnn_decoder
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.ops.pallas_minsum import make_fused_minsum
    from ldpc_tpu.utils import bpsk_awgn_llr
    from ldpc_tpu.utils.metrics import REGISTRY, decode_throughput
    from ldpc_tpu.utils.profiling import trace

    # LDPC_TPU_TRACE=<dir> captures a jax.profiler device trace of the run.
    trace_dir = os.environ.get("LDPC_TPU_TRACE")
    _stack = contextlib.ExitStack()
    if trace_dir:
        _stack.enter_context(trace(trace_dir))

    qc = qc_layout(get_base_graph(CODE), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    on_tpu = jax.default_backend() == "tpu"

    # --- min-sum (fused Pallas kernel on TPU; XLA scan elsewhere) --------
    fused = make_fused_minsum(qc, ITERS, 0.75, batch_tile=128) if on_tpu else None

    @partial(jax.jit, static_argnames=("B",))
    def minsum_pipe(key, B):
        llr = bpsk_awgn_llr(key, jnp.zeros((B, n)), 3.0)
        if fused is not None:
            bits, conv = fused(llr)
            return bits.sum(), conv.astype(jnp.float32).mean()
        res = decode_min_sum(llr, plan, ITERS, 0.75)
        return res.bits.sum(), res.conv_iter.astype(jnp.float32).mean()

    def time_fn(fn, reps=10):
        # Timing discipline for remote/tunneled backends: block_until_ready
        # can return before real device execution completes, so (a) saturate
        # the queue with back-to-back dispatches and (b) synchronize with an
        # actual VALUE fetch of the last result, which cannot be elided.
        outs = [fn(i) for i in range(2)]  # warmup (compile + steady)
        _ = [float(x) for x in jax.tree_util.tree_leaves(outs[-1])]
        t0 = time.time()
        outs = [fn(100 + i) for i in range(reps)]
        _ = [float(x) for x in jax.tree_util.tree_leaves(outs[-1])]
        return (time.time() - t0) / reps, outs[-1]

    dt_ms, (err_ms, iters_ms) = time_fn(
        lambda i: minsum_pipe(jax.random.PRNGKey(i), MINSUM_BATCH)
    )
    minsum_bps = decode_throughput(MINSUM_BATCH, n, dt_ms, name="minsum")

    # --- message GNN (fused Pallas serving kernel on TPU; XLA elsewhere) ---
    model = create_message_gnn_decoder(plan, num_iterations=ITERS, hidden_dim=GNN_HIDDEN)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, n)), plan)
    if on_tpu:
        from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder

        gnn_soft = make_fused_gnn_decoder(
            qc, params, num_iterations=ITERS, hidden_dim=GNN_HIDDEN
        )
    else:
        gnn_soft = None

    @partial(jax.jit, static_argnames=("B",))
    def gnn_pipe(params, key, B):
        llr = bpsk_awgn_llr(key, jnp.zeros((B, n)), 3.0)
        if gnn_soft is not None:
            soft = gnn_soft(llr)
        else:
            soft, _ = model.apply(params, llr, plan)
        return (soft > 0.5).astype(jnp.float32).sum()

    dt_gnn, _ = time_fn(lambda i: gnn_pipe(params, jax.random.PRNGKey(i), GNN_BATCH), reps=5)
    gnn_bps = decode_throughput(GNN_BATCH, n, dt_gnn, name="msg_gnn")

    # --- flagship corrected GNN (trained ckpt, if present) -----------------
    corrected_bps = None
    if on_tpu:
        from pathlib import Path

        ckpt = Path("results/corrected_gnn_nr_2_0_4.msgpack")
        if ckpt.exists():
            from flax import serialization

            from ldpc_tpu.codes import get_base_graph as _gbg
            from ldpc_tpu.models.message_gnn import (
                create_corrected_minsum_gnn_decoder,
            )
            from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder

            qc4 = qc_layout(_gbg("nr_2_0_4"), 4)
            plan4 = qc_msg.make_plan(qc4)
            n4 = plan4.C * plan4.Z
            m4 = create_corrected_minsum_gnn_decoder(
                plan4, num_iterations=5, hidden_dim=64, input_injection=True
            )
            payload = serialization.msgpack_restore(ckpt.read_bytes())
            p4 = serialization.from_state_dict(
                m4.init(jax.random.PRNGKey(0), jnp.zeros((2, n4)), plan4),
                payload["params"],
            )
            corr = make_fused_corrected_gnn_decoder(
                qc4, p4, num_iterations=5, hidden_dim=64, early_exit=True
            )

            @jax.jit
            def corr_pipe(key):
                llr = bpsk_awgn_llr(key, jnp.zeros((4096, n4)), 3.0)
                return (corr(llr) > 0.5).astype(jnp.float32).sum()

            dt_c, _ = time_fn(lambda i: corr_pipe(jax.random.PRNGKey(i)), reps=5)
            corrected_bps = decode_throughput(4096, n4, dt_c, name="corrected_gnn")

    # --- large-Z (Z=384, 5G maximum) via the Z-in-lanes kernel -------------
    zlane_bps = None
    if on_tpu:
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum_zlane

        qc384 = qc_layout(get_base_graph(CODE), 384)
        n384 = qc384.num_base_cols * 384
        zfused = make_fused_minsum_zlane(qc384, ITERS, 0.75)

        @jax.jit
        def zlane_pipe(key):
            llr = bpsk_awgn_llr(key, jnp.zeros((512, n384)), 3.0)
            bits, conv = zfused(llr)
            return bits.sum(), conv.astype(jnp.float32).mean()

        dt_z, _ = time_fn(lambda i: zlane_pipe(jax.random.PRNGKey(i)), reps=5)
        zlane_bps = decode_throughput(512, n384, dt_z, name="z384_zlane")

    _stack.close()  # flush the profiler trace (if enabled) before reporting
    print(
        json.dumps(
            {
                "metric": "minsum_decoded_bits_per_s_per_chip",
                "value": round(minsum_bps, 1),
                "unit": "bits/s",
                "vs_baseline": round(minsum_bps / REF_BITS_PER_S, 1),
                "details": {
                    "code": CODE,
                    "Z": Z,
                    "iterations": ITERS,
                    "minsum_kernel": "pallas_fused" if fused is not None else "xla_scan",
                    "minsum_batch": MINSUM_BATCH,
                    "minsum_ms_per_batch": round(dt_ms * 1e3, 2),
                    "minsum_bit_errors_at_3db": float(err_ms),
                    "minsum_mean_conv_iters": round(float(iters_ms), 2),
                    "msg_gnn_bits_per_s": round(gnn_bps, 1),
                    "msg_gnn_kernel": "pallas_fused" if gnn_soft is not None else "xla",
                    "z384_zlane_bits_per_s": round(zlane_bps, 1) if zlane_bps else None,
                    "corrected_gnn_early_exit_bits_per_s": (
                        round(corrected_bps, 1) if corrected_bps else None
                    ),
                    "msg_gnn_hidden": GNN_HIDDEN,
                    "msg_gnn_batch": GNN_BATCH,
                    "baseline_bits_per_s": REF_BITS_PER_S,
                    "backend": jax.default_backend(),
                    "metrics": REGISTRY.snapshot()["gauges"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
