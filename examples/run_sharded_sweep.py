"""Multi-chip sharded BER/FER sweep (BASELINE config #5 shape).

Shards the Monte-Carlo grid over all visible devices and compares BP,
min-sum, and (optionally) a trained neural decoder on NR_2_0_32.  On a
single chip this runs unsharded; the results are bit-identical either way.

Run:  PYTHONPATH=. python examples/run_sharded_sweep.py [--trials 10]
"""
from __future__ import annotations

import argparse

import jax

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.classical import decode_bp, decode_min_sum
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.parallel import make_mesh, mc_sweep


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    plan = qc_msg.make_plan(qc_layout(get_base_graph("nr_2_0_32"), 32))
    n_dev = len(jax.devices())
    mesh = make_mesh(data=n_dev, model=1) if n_dev > 1 else None
    print(f"devices: {n_dev} ({'sharded' if mesh else 'single-chip'})")

    snrs = [-4.0, -3.0, -2.0, -1.0, 0.0]
    for name, decode in [
        ("min-sum(20)", lambda llr: decode_min_sum(llr, plan, 20, 0.75).bits),
        ("bp(20)", lambda llr: decode_bp(llr, plan, 20).bits),
    ]:
        out = mc_sweep(decode, plan, snrs, args.batch, args.trials, mesh=mesh,
                       modulation="bpsk")
        row = "  ".join(f"{s:+.0f}dB:{b:.2e}" for s, b in zip(out["snr"], out["ber"]))
        print(f"{name:12s} BER {row}")


if __name__ == "__main__":
    main()
