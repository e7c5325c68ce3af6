"""Pre-eval sanity: fused corrected-v2 serving kernel vs the XLA module
path at T=20 on the grown Z=32 checkpoint (decision agreement on a noisy
batch).  The per-T kernel parity tests cover T in {1,2,3,5,10}; this
one-off guards the T=20 high-precision artifact against a depth-dependent
kernel regression before 1e9 bits get attributed to it.

Run on TPU:  PYTHONPATH=/root/.axon_site:. python tools/check_corrected20_parity.py
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results/corrected20_gnn_nr_2_0_32.msgpack")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--snr", type=float, default=-2.5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2
    from ldpc_tpu.utils import qpsk_awgn_llr

    qc = qc_layout(get_base_graph("nr_2_0_32"), 32)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = create_corrected_minsum_gnn_decoder(
        plan, num_iterations=args.iters, hidden_dim=64, input_injection=True
    )
    payload = serialization.msgpack_restore(open(args.ckpt, "rb").read())
    params = serialization.from_state_dict(
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, n)), plan),
        payload["params"],
    )
    fused = make_fused_corrected_gnn_decoder_v2(
        qc, params, num_iterations=args.iters, hidden_dim=64
    )
    llr = qpsk_awgn_llr(jax.random.PRNGKey(7), jnp.zeros((args.batch, n)), args.snr)
    hard_fused = (fused(llr) > 0.5).astype(jnp.int32)
    hard_xla = (model.apply(params, llr, plan)[0] > 0.5).astype(jnp.int32)
    mismatch = int(jnp.abs(hard_fused - hard_xla).sum())
    total = args.batch * n
    xla_errs = int(hard_xla.sum())  # all-zero codewords: 1s are bit errors
    fused_errs = int(hard_fused.sum())
    print(f"batch {args.batch} x {n} at {args.snr} dB: "
          f"decision mismatches {mismatch}/{total} "
          f"(xla errs {xla_errs}, fused errs {fused_errs})")
    assert mismatch <= max(2, total * 1e-4), "fused/XLA decision divergence"
    print("parity OK")


if __name__ == "__main__":
    main()
