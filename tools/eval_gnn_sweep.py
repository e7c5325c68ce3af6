"""Evaluate the fully-neural message-GNN size sweep into one artifact.

Settles the round-1 open question (VERDICT r1 weak #1): is the
reference-spec GNN's BER plateau an architecture property or a training
artifact?  Loads every trained sweep checkpoint (tools/train_flagship.py
--model gnn at several hidden widths / iteration counts) plus the round-1
h=64 model, evaluates all of them under the identical Monte-Carlo protocol
(random codewords via the GF(2) encoder — the honest protocol for this
non-sign-symmetric decoder — QPSK/AWGN, deterministic per-(snr, trial)
keys so every model sees the same noise), and records classical min-sum(5)
and BP(50) on the same noise as the quality bar.

Reference semantics being swept: `message_gnn_decoder.py:155-353`
(h, T are its constructor's hidden_dim / num_iterations).

Run on TPU:  PYTHONPATH=/root/.axon_site:. python tools/eval_gnn_sweep.py
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

# (tag, hidden, iters, multiloss, checkpoint, training note)
SWEEP = [
    ("h=64 T=5 (r1)", 64, 5, False, "results/message_gnn_nr_2_0_4.msgpack",
     "30k steps, no multiloss (round-1 recipe)"),
    ("h=64 T=5", 64, 5, True, "results/gnn_sweep_h64_t5.msgpack",
     "12k steps, multiloss"),
    ("h=128 T=5", 128, 5, True, "results/gnn_sweep_h128_t5.msgpack",
     "12k steps, multiloss"),
    ("h=256 T=5", 256, 5, True, "results/gnn_sweep_h256_t5.msgpack",
     "12k steps, multiloss"),
    ("h=128 T=10", 128, 10, True, "results/gnn_sweep_h128_t10.msgpack",
     "12k steps, multiloss"),
    ("h=64 T=5 @2k", 64, 5, True, "results/gnn_sweep_h64_t5_2k.msgpack",
     "2000 steps, batch 32, SNR [-2,6] — budget-matched to the round-4 "
     "reference-GNN training run (reference_torch_gnn artifact)"),
    ("h=128 T=10 ft", 128, 10, True, "results/gnn_sweep_h128_t10_ft.msgpack",
     "12k + reduced-LR (1e-4 const) fine-tune over SNR [-3,4] — the "
     "high-SNR floor fix (VERDICT r3 item 2)"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="nr_2_0_4")
    ap.add_argument("--Z", type=int, default=4)
    ap.add_argument("--trials", type=int, default=40)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--out", default="results/gnn_size_sweep.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import encoder_from_H, expand_base_matrix, get_base_graph, qc_layout
    from ldpc_tpu.models.classical import decode_bp, decode_min_sum
    from ldpc_tpu.models.message_gnn import create_message_gnn_decoder
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.parallel import mc_sweep
    from ldpc_tpu.training import LDPCDecoderTrainer

    bg = get_base_graph(args.code)
    qc = qc_layout(bg, args.Z)
    plan = qc_msg.make_plan(qc)
    enc = encoder_from_H(expand_base_matrix(bg, args.Z))
    snrs = [-2.0, -1.0, 0.0, 1.0, 2.0, 3.0, 4.0]
    kw = dict(snr_range=snrs, batch_size=args.batch, num_trials=args.trials,
              encoder=enc, seed=911)

    out: dict = {
        "protocol": {
            "code": args.code, "Z": args.Z, "codewords": "random (GF(2) encoder)",
            "modulation": "qpsk", "trials": args.trials, "batch": args.batch,
            "bits_per_point": args.trials * args.batch * plan.C * plan.Z,
            "identical_noise": "per-(snr, trial) folded keys, same for all models",
        },
        "snr_range": snrs,
        "models": {},
    }

    # Classical bars on the same noise.
    for name, fn in [
        ("min-sum(5)", lambda llr: decode_min_sum(llr, plan, 5, 0.75).bits),
        ("BP(50)", lambda llr: decode_bp(llr, plan, 50, early_exit=True).bits),
    ]:
        t0 = time.time()
        r = mc_sweep(jax.jit(fn), plan, **kw)
        out["models"][name] = {"ber": r["ber"], "fer": r["fer"], "params": 0,
                               "training": "classical"}
        print(f"{name}: BER@+2 {r['ber'][4]:.3e}  ({time.time()-t0:.0f}s)", flush=True)

    for tag, hidden, iters, multiloss, ckpt, note in SWEEP:
        if not Path(ckpt).exists():
            print(f"{tag}: {ckpt} missing — skipped", flush=True)
            continue
        model = create_message_gnn_decoder(
            plan, num_iterations=iters, hidden_dim=hidden,
            input_injection=True, multiloss=multiloss,
        )
        tr = LDPCDecoderTrainer(model, plan, seed=0, encoder=enc)
        tr.load_model(ckpt)
        n_params = int(sum(x.size for x in jax.tree_util.tree_leaves(tr.params)))
        params = tr.params
        decode = jax.jit(
            lambda llr, p=params, m=model: (m.apply(p, llr, plan)[0] > 0.5).astype(jnp.float32)
        )
        t0 = time.time()
        r = mc_sweep(decode, plan, **kw)
        out["models"][tag] = {"ber": r["ber"], "fer": r["fer"],
                              "params": n_params, "training": note}
        print(f"{tag} ({n_params} params): BER@+2 {r['ber'][4]:.3e}  "
              f"({time.time()-t0:.0f}s)", flush=True)

    Path(args.out).write_text(json.dumps(out, indent=2))
    print(f"wrote {args.out}", flush=True)

    # Markdown table for results/README.md.
    print("\n| Model | Params | " + " | ".join(f"{s:+.0f} dB" for s in snrs) + " |")
    print("|---|---:|" + "---:|" * len(snrs))
    for tag, r in out["models"].items():
        row = " | ".join(f"{b:.2e}" for b in r["ber"])
        print(f"| {tag} | {r['params']} | {row} |")


if __name__ == "__main__":
    main()
