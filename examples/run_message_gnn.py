"""End-to-end message-GNN demo on a small base graph.

Counterpart of the reference's only working entry point
(``examples/run_message_gnn.py``, SURVEY.md §0): load a 4x8 base graph,
lift Z=4, run the message-centered GNN decoder (and its full-min-sum hybrid)
on zero codewords through a QPSK/AWGN channel, and report BER — plus a short
training loop, which the reference demo omits.

Run:  PYTHONPATH=. python examples/run_message_gnn.py [--snr 5.0] [--train]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ldpc_tpu.codes import encoder_from_H, expand_base_matrix, get_base_graph, qc_layout
from ldpc_tpu.models.message_gnn import (
    create_custom_minsum_message_gnn_decoder,
    create_message_gnn_decoder,
)
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.training import LDPCDecoderTrainer
from ldpc_tpu.utils import compute_ber_fer, qpsk_awgn_llr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snr", type=float, default=5.0)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--train", action="store_true", help="train for a few epochs first")
    args = ap.parse_args()

    bg = get_base_graph("toy_4x8")
    Z = 4
    qc = qc_layout(bg, Z)
    plan = qc_msg.make_plan(qc)
    H = expand_base_matrix(bg, Z)
    n = plan.C * plan.Z
    print(f"base graph {bg.shifts.shape}, Z={Z} -> H {H.shape}, {qc.num_edges} edges, "
          f"{plan.num_edge_types} message types")

    enc = encoder_from_H(H)  # replaces the reference's rejection sampler
    model = create_message_gnn_decoder(plan, num_iterations=3, hidden_dim=32)
    trainer = LDPCDecoderTrainer(model, plan, seed=0, encoder=enc)

    if args.train:
        print("training 50 epochs on random codewords ...")
        trainer.train(num_epochs=50, batch_size=64, learning_rate=1e-3,
                      snr_range=[2.0, 4.0, 6.0], validation_interval=25, log=print,
                      optimizer="adam", weight_decay=0.0, grad_clip=1.0,
                      data_mode="random_codewords")

    # Random valid codewords through QPSK/AWGN (honest for the
    # non-sign-symmetric GNN; see docs/MESSAGE_GNN.md)
    bits = enc.random_codewords(jax.random.PRNGKey(7), args.batch)
    llr = qpsk_awgn_llr(jax.random.PRNGKey(1), bits, args.snr)
    decoded = model.decode(trainer.params, llr, plan)
    ber, fer = compute_ber_fer(bits, decoded)
    print(f"message GNN       @ {args.snr} dB: BER={float(ber):.4f} FER={float(fer):.3f}")

    hybrid = create_custom_minsum_message_gnn_decoder(plan, num_iterations=8)
    hparams = hybrid.init(jax.random.PRNGKey(2), llr, plan)
    hdecoded = hybrid.decode(hparams, llr, plan)
    hber, hfer = compute_ber_fer(bits, hdecoded)
    print(f"full-min-sum GNN  @ {args.snr} dB: BER={float(hber):.4f} FER={float(hfer):.3f}")


if __name__ == "__main__":
    main()
