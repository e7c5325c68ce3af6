"""Diagnose the corrected_z32 bench discrepancy (VERDICT r4 weak #1).

The round-4 driver bench recorded 1.73 Mbit/s for the Z=32 flagship
serving section while the in-round measurement (and docs/PERFORMANCE.md)
said 42.7 Mbit/s — same code, checkpoint, and config.  This probe runs
the exact section configuration with per-rep timing over several
separated windows, for both the early-exit (batch-global while_loop) and
fixed-T variants, and prints everything, so the cause (device phase,
while_loop pathology, queue behavior, compile anomaly) is visible.

Usage: PYTHONPATH=. python tools/diag_corrected_z32.py [--windows 3]
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--gap-s", type=float, default=5.0)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--snr", type=float, default=0.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2
    from ldpc_tpu.utils import bpsk_awgn_llr

    qc32 = qc_layout(get_base_graph("nr_2_0_32"), 32)
    plan32 = qc_msg.make_plan(qc32)
    n32 = plan32.C * plan32.Z
    m32 = create_corrected_minsum_gnn_decoder(
        plan32, num_iterations=10, hidden_dim=64, input_injection=True
    )
    payload = serialization.msgpack_restore(
        open("results/corrected10_gnn_nr_2_0_32_ft3.msgpack", "rb").read()
    )
    p32 = serialization.from_state_dict(
        m32.init(jax.random.PRNGKey(0), jnp.zeros((2, n32)), plan32),
        payload["params"],
    )

    variants = {}
    for name, kw in [
        ("early_exit", dict(early_exit=True)),
        ("fixed_T", dict(early_exit=False)),
    ]:
        corr = make_fused_corrected_gnn_decoder_v2(
            qc32, p32, num_iterations=10, hidden_dim=64, **kw
        )

        @jax.jit
        def corr_pipe(key, corr=corr):
            llr = bpsk_awgn_llr(key, jnp.zeros((args.batch, n32)), args.snr)
            return (corr(llr) > 0.5).astype(jnp.float32).sum()

        variants[name] = corr_pipe

    out = {"batch": args.batch, "snr": args.snr, "n": n32, "windows": {}}
    for name, fn in variants.items():
        t0 = time.time()
        _ = float(fn(jax.random.PRNGKey(0)))  # compile
        compile_s = time.time() - t0
        wins = []
        for w in range(args.windows):
            per_rep = []
            for i in range(args.reps):
                t0 = time.time()
                _ = float(fn(jax.random.PRNGKey(1000 * w + 100 + i)))
                per_rep.append(round(time.time() - t0, 4))
            wins.append(per_rep)
            bps = args.batch * n32 / (sum(per_rep) / len(per_rep))
            print(f"{name} window {w}: per-rep {per_rep}  -> "
                  f"{bps / 1e6:.1f} Mbit/s", flush=True)
            time.sleep(args.gap_s)
        out["windows"][name] = {"compile_s": round(compile_s, 2), "reps": wins}

    # Queue-saturated timing exactly like bench.py's _time_fn, for contrast.
    for name, fn in variants.items():
        outs = [fn(jax.random.PRNGKey(i)) for i in range(2)]
        _ = float(outs[-1])
        t0 = time.time()
        outs = [fn(jax.random.PRNGKey(100 + i)) for i in range(args.reps)]
        _ = float(outs[-1])
        dt = (time.time() - t0) / args.reps
        bps = args.batch * n32 / dt
        print(f"{name} bench-style queued: {dt * 1e3:.1f} ms/rep -> "
              f"{bps / 1e6:.1f} Mbit/s", flush=True)
        out["windows"][name]["queued_ms_per_rep"] = round(dt * 1e3, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
