"""Serve a trained neural min-sum decoder through the fused Pallas kernel.

Loads a trained checkpoint (e.g. the committed results/ artifacts), bakes
its weights into the VMEM-resident decode kernel, and decodes at Gbit/s —
the production serving path for learned decoders.

Run:  PYTHONPATH=. python examples/serve_trained_decoder.py \
          [--checkpoint results/standard_nr_2_0_4.msgpack] \
          [--model neural_minsum | corrected_gnn | message_gnn]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.neural_min_sum import NeuralMinSumDecoder
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.training import LDPCDecoderTrainer
from ldpc_tpu.utils import compute_ber_fer, qpsk_awgn_llr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="results/standard_nr_2_0_4.msgpack")
    ap.add_argument("--model", default="neural_minsum",
                    choices=["neural_minsum", "corrected_gnn", "message_gnn"])
    ap.add_argument("--code", default="nr_2_0_4")
    ap.add_argument("--Z", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--snr", type=float, default=0.0)
    ap.add_argument("--early-exit", action="store_true",
                    help="corrected_gnn only: per-tile syndrome early exit")
    ap.add_argument("--zero-codewords", action="store_true",
                    help="evaluate on the all-zero codeword (misleading for "
                         "the GNN family, which is not sign-symmetric; the "
                         "default GF(2)-encoded random codewords are the "
                         "honest protocol)")
    args = ap.parse_args()

    qc = qc_layout(get_base_graph(args.code), args.Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z

    if args.model == "neural_minsum":
        model = NeuralMinSumDecoder(num_iterations=args.iters, depth_L=2,
                                    weight_sharing="edge", learnable_alpha=True,
                                    loss_mode="mean")
    elif args.model == "corrected_gnn":
        from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder

        model = create_corrected_minsum_gnn_decoder(
            plan, num_iterations=args.iters, hidden_dim=args.hidden,
            input_injection=True)
    else:
        from ldpc_tpu.models.message_gnn import create_message_gnn_decoder

        model = create_message_gnn_decoder(
            plan, num_iterations=args.iters, hidden_dim=args.hidden,
            input_injection=True)
    tr = LDPCDecoderTrainer(model, plan, seed=0)
    tr.load_model(args.checkpoint)
    print(f"loaded {args.checkpoint}")

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        decode = lambda llr: model.decode(tr.params, llr, plan)
        path = "XLA path (no TPU)"
    elif args.model == "neural_minsum":
        from ldpc_tpu.ops.pallas_minsum import fused_kernel_fits
        from ldpc_tpu.ops.pallas_neural import make_fused_neural_minsum

        assert fused_kernel_fits(qc)
        decode = make_fused_neural_minsum(qc, tr.params, num_iterations=args.iters,
                                          depth_L=2)
        path = "fused Pallas kernel"
    elif args.model == "corrected_gnn":
        # v2 = the element-count-reduced serving kernel (+35% measured,
        # docs/PERFORMANCE.md)
        from ldpc_tpu.ops.pallas_gnn import (
            make_fused_corrected_gnn_decoder_v2 as make_fused_corrected_gnn_decoder,
        )

        soft_fn = make_fused_corrected_gnn_decoder(
            qc, tr.params, num_iterations=args.iters, hidden_dim=args.hidden,
            input_injection=True, early_exit=args.early_exit)
        decode = lambda llr: (soft_fn(llr) > 0.5).astype(jnp.float32)
        path = "fused corrected-GNN kernel" + (
            " (early exit)" if args.early_exit else "")
    else:
        from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder

        soft_fn = make_fused_gnn_decoder(
            qc, tr.params, num_iterations=args.iters, hidden_dim=args.hidden,
            input_injection=True)
        decode = lambda llr: (soft_fn(llr) > 0.5).astype(jnp.float32)
        path = "fused message-GNN kernel"

    if args.zero_codewords:
        make_bits = lambda key: jnp.zeros((args.batch, n))
    else:
        from ldpc_tpu.codes import encoder_from_H, expand_base_matrix

        enc = encoder_from_H(expand_base_matrix(get_base_graph(args.code), args.Z))
        make_bits = lambda key: enc.random_codewords(key, args.batch)

    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    bits = make_bits(k0)
    llr = qpsk_awgn_llr(k1, bits, args.snr)
    hard = decode(llr)
    ber, fer = compute_ber_fer(bits, hard)
    print(f"{path}: BER {float(ber):.3e}  FER {float(fer):.3f} at {args.snr} dB")

    # steady-state throughput (fresh keys; sync via value fetch)
    @jax.jit
    def pipe(key):
        kb, kc = jax.random.split(key)
        return decode(qpsk_awgn_llr(kc, make_bits(kb), args.snr)).sum()

    float(pipe(jax.random.PRNGKey(1)))
    t0 = time.time()
    outs = [pipe(jax.random.PRNGKey(10 + i)) for i in range(10)]
    _ = float(outs[-1])
    dt = (time.time() - t0) / 10
    bps = args.batch * n / dt
    unit = f"{bps / 1e9:.2f} Gbit/s" if bps >= 1e9 else f"{bps / 1e6:.1f} Mbit/s"
    print(f"throughput: {unit}")


if __name__ == "__main__":
    main()
