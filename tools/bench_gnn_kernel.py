"""Benchmark the fused message-GNN kernels vs the XLA module path on TPU.

Validates compiled-kernel parity with the Flax module on the trained
checkpoints, then measures steady-state decoded bits/s for:
  - fully-neural message GNN: XLA vs make_fused_gnn_decoder
  - corrected GNN (flagship): XLA vs make_fused_corrected_gnn_decoder

Run:  PYTHONPATH=. python tools/bench_gnn_kernel.py [--batch 2048]
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, llrs, sync=lambda o: float(np.asarray(o).sum())):
    """Best-of-3 steady-state seconds per call (tunnel-safe: fresh inputs,
    value-fetch sync, warmup run discarded)."""
    sync(fn(llrs[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        outs = [fn(l) for l in llrs[1:]]
        sync(outs[-1])
        best = min(best, (time.time() - t0) / (len(llrs) - 1))
    return best


def bench_interleaved(fns, llrs, rounds=6,
                      sync=lambda o: float(np.asarray(o).sum())):
    """Per-kernel best across ROUND-ROBIN timing windows.

    The tunneled device's effective rate is bimodal on ~seconds timescales
    (observed 2026-08-21: identical warm kernels measuring 21 vs 40 Mbit/s
    in adjacent runs, rankings flipping run to run).  Timing each kernel in
    its own contiguous window lets one slow phase poison one kernel;
    interleaving rounds across all kernels and keeping each kernel's best
    window samples every kernel in the fast phase."""
    for fn in fns:
        sync(fn(llrs[0]))  # warm all first
    best = [float("inf")] * len(fns)
    for _ in range(rounds):
        for i, fn in enumerate(fns):
            t0 = time.time()
            outs = [fn(l) for l in llrs[1:]]
            sync(outs[-1])
            best[i] = min(best[i], (time.time() - t0) / (len(llrs) - 1))
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--code", default="nr_2_0_4")
    ap.add_argument("--Z", type=int, default=4)
    ap.add_argument("--fresh", action="store_true",
                    help="bench fresh (untrained) params — kernel speed does "
                         "not depend on weight values")
    ap.add_argument("--kernels", default=None,
                    help="comma list of fused variants to run (e.g. v1,v2,v4); "
                         "default all — skips cold compiles of the others")
    ap.add_argument("--gnn-checkpoint", default="results/message_gnn_nr_2_0_4.msgpack")
    ap.add_argument("--corrected-checkpoint",
                    default="results/corrected_gnn_nr_2_0_4.msgpack")
    args = ap.parse_args()

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.message_gnn import (
        create_corrected_minsum_gnn_decoder,
        create_message_gnn_decoder,
    )
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.ops.pallas_gnn import (
        make_fused_corrected_gnn_decoder,
        make_fused_corrected_gnn_decoder_v2,
        make_fused_gnn_decoder,
        make_fused_gnn_decoder_v2,
        make_fused_gnn_decoder_v3,
        make_fused_gnn_decoder_v4,
    )
    from ldpc_tpu.training import LDPCDecoderTrainer
    from ldpc_tpu.utils import bpsk_awgn_llr
    from ldpc_tpu.utils.profiling import gnn_roofline

    qc = qc_layout(get_base_graph(args.code), args.Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    B = args.batch
    print(f"backend={jax.default_backend()} n={n} batch={B}")
    llrs = [bpsk_awgn_llr(jax.random.PRNGKey(50 + i), jnp.zeros((B, n)), 1.0)
            for i in range(6)]
    for l in llrs:
        l.block_until_ready()

    cases = []
    if args.fresh or Path(args.gnn_checkpoint).exists():
        cases.append(("message_gnn",
                      None if args.fresh else args.gnn_checkpoint,
                      create_message_gnn_decoder,
                      [("fused_v1", make_fused_gnn_decoder),
                       ("fused_v2", make_fused_gnn_decoder_v2),
                       ("fused_v3", make_fused_gnn_decoder_v3),
                       ("fused_v4", make_fused_gnn_decoder_v4)]))
    if not args.fresh and Path(args.corrected_checkpoint).exists():
        cases.append(("corrected_gnn", args.corrected_checkpoint,
                      create_corrected_minsum_gnn_decoder,
                      [("fused", make_fused_corrected_gnn_decoder),
                       ("fused_v2", make_fused_corrected_gnn_decoder_v2)]))

    rl = gnn_roofline(qc, args.hidden, args.iters, input_injection=True)
    bounds = rl.bound_bits_per_s(n)
    print(f"roofline (h={args.hidden}, T={args.iters}): "
          f"MXU peak {bounds['mxu_bound_bits_per_s'] / 1e6:.1f} Mbit/s, "
          f"(h/128)^2 fill ceiling {bounds['mxu_bound_achievable_bits_per_s'] / 1e6:.1f}, "
          f"VPU {bounds['vpu_bound_bits_per_s'] / 1e6:.1f}")

    if args.kernels:
        want = {k.strip() for k in args.kernels.split(",")}
        cases = [
            (n, c, f, [(fn, fu) for fn, fu in fusers
                       if fn.replace("fused_", "").replace("fused", "v1") in want])
            for n, c, f, fusers in cases
        ]

    for name, ckpt, factory, fusers in cases:
        model = factory(plan, num_iterations=args.iters, hidden_dim=args.hidden,
                        input_injection=True)
        tr = LDPCDecoderTrainer(model, plan, seed=0)
        if ckpt is not None:
            tr.load_model(ckpt)

        @jax.jit
        def xla_soft(llr, params=tr.params, model=model):
            soft, _ = model.apply(params, llr, plan)
            return soft

        dt_x = bench(xla_soft, llrs)
        print(f"{name}: XLA {B * n / dt_x / 1e6:.1f} Mbit/s", flush=True)
        fused_list, checks = [], []
        for fname, fuse in fusers:
            fused = fuse(qc, tr.params, num_iterations=args.iters,
                         hidden_dim=args.hidden, input_injection=True)
            a = np.asarray(fused(llrs[0]))
            b = np.asarray(xla_soft(llrs[0]))
            conf = np.abs(b - 0.5) > 0.05
            agree = ((a > 0.5) == (b > 0.5))[conf].mean() if conf.any() else 1.0
            fused_list.append(fused)
            checks.append((fname, float(np.abs(a - b).max()), float(agree)))
        dts = bench_interleaved(fused_list, llrs)
        for (fname, dmax, agree), dt_f in zip(checks, dts):
            bps = B * n / dt_f
            mfu = bps * rl.mxu_flops_per_frame / n / 1.97e14
            print(f"{name}/{fname}: {bps / 1e6:.1f} Mbit/s  "
                  f"speedup_vs_xla {dt_x / dt_f:.1f}x  MFU {mfu * 100:.1f}%  "
                  f"|diff| max {dmax:.4f}  "
                  f"decision agreement {agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
