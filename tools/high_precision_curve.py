"""High-precision BER/FER curve via the fused kernel.

Resolves the NR_2_0_32 min-sum waterfall down to BER ~1e-8 (10^9+ bits per
SNR point) — minutes of chip time at the fused kernel's Gbit/s throughput,
and completely out of reach of the reference implementation (at its 666
bit/s this sweep would take ~6 months).

Run:  PYTHONPATH=. python tools/high_precision_curve.py [--bits-per-point 1e9]
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits-per-point", type=float, default=1e9)
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="results/nr_2_0_32_minsum_highprecision.json")
    args = ap.parse_args()

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.ops.pallas_minsum import make_fused_minsum
    from ldpc_tpu.utils import bpsk_awgn_llr

    qc = qc_layout(get_base_graph("nr_2_0_32"), 32)
    n = qc.num_vars
    fused = make_fused_minsum(qc, args.iters, 0.75, track_convergence=False)
    B = args.batch

    @jax.jit
    def trial(key, snr):
        llr = bpsk_awgn_llr(key, jnp.zeros((B, n)), snr)
        bits = fused(llr)[0]
        return bits.sum(), (bits.sum(axis=1) > 0).sum()

    snrs = [-5.0, -4.5, -4.0, -3.5, -3.0, -2.5, -2.0]
    trials_per_point = max(1, int(args.bits_per_point / (B * n)))
    results = {"snr": snrs, "ber": [], "fer": [], "bits_per_point": trials_per_point * B * n,
               "iterations": args.iters, "batch": B, "code": "nr_2_0_32"}
    t_start = time.time()
    for i, snr in enumerate(snrs):
        be = fe = 0.0
        outs = []
        for t in range(trials_per_point):
            key = jax.random.fold_in(jax.random.fold_in(jax.random.PRNGKey(99), i), t)
            outs.append(trial(key, jnp.float32(snr)))
        for b, f in outs:  # fetch = sync
            be += float(b)
            fe += float(f)
        ber = be / (trials_per_point * B * n)
        fer = fe / (trials_per_point * B)
        results["ber"].append(ber)
        results["fer"].append(fer)
        print(f"snr {snr:+.1f}: BER {ber:.3e}  FER {fer:.3e} "
              f"({be:.0f} bit errors / {trials_per_point * B * n:.0f} bits)", flush=True)
    wall = time.time() - t_start
    results["wall_seconds"] = round(wall, 1)
    results["decoded_bits_per_s"] = round(len(snrs) * trials_per_point * B * n / wall, 1)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.out}  ({wall:.0f}s total, "
          f"{results['decoded_bits_per_s']/1e9:.2f} Gbit/s sustained)")


if __name__ == "__main__":
    main()
