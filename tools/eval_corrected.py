"""Evaluate a trained corrected-GNN checkpoint into the comparison artifact.

Runs the flagship checkpoint (tools/train_flagship.py output) through the
same Monte-Carlo protocol as tools/make_curves.py (random codewords via the
GF(2) encoder, QPSK/AWGN, deterministic per-(seed, snr, trial) keys — so the
new curve is directly comparable to the committed ones) and merges it into
results/nr_2_0_4_comparison.json + regenerates the PNG.

Run on TPU:  PYTHONPATH=. python tools/eval_corrected.py
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="results/corrected_gnn_nr_2_0_4.msgpack")
    ap.add_argument("--name", default="Corrected GNN 5it (trained)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--code", default="nr_2_0_4")
    ap.add_argument("--Z", type=int, default=4)
    ap.add_argument("--merge", default="results/nr_2_0_4_comparison.json")
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    from ldpc_tpu.codes import encoder_from_H, expand_base_matrix, get_base_graph, qc_layout
    from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.training import LDPCDecoderTrainer
    from ldpc_tpu.training.evaluator import ComparativeEvaluator
    from ldpc_tpu.visualization.plots import plot_combined

    bg = get_base_graph(args.code)
    qc = qc_layout(bg, args.Z)
    plan = qc_msg.make_plan(qc)
    enc = encoder_from_H(expand_base_matrix(bg, args.Z))

    model = create_corrected_minsum_gnn_decoder(
        plan, num_iterations=args.iters, hidden_dim=args.hidden, input_injection=True
    )
    tr = LDPCDecoderTrainer(model, plan, seed=0, encoder=enc)
    tr.load_model(args.checkpoint)
    print(f"loaded {args.checkpoint}")

    merged = json.loads(Path(args.merge).read_text())
    snrs = merged["snr_range"]

    ev = ComparativeEvaluator(plan, snr_range=snrs, batch_size=args.batch,
                              num_trials=args.trials, encoder=enc)
    ev.add_model(args.name, model, tr.params)
    ev.evaluate_all(log=print)
    ev.print_summary()

    merged["decoders"].update(ev.results["decoders"])
    Path(args.merge).write_text(json.dumps(merged, indent=1))
    fig = plot_combined(merged)
    fig.savefig(Path(args.merge).with_suffix(".png"), bbox_inches="tight")
    print(f"merged into {args.merge} (+ .png)")


if __name__ == "__main__":
    main()
