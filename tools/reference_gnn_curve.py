"""Train the REFERENCE's torch message-GNN decoder and regenerate its
BER/FER curve — the missing reference side of the ±0.1 dB north star.

The reference never ships a trained GNN (its committed artifacts are
untrained-level, BASELINE.md) and its primary entry points don't import, so
this harness drives the reference's own `MessageGNNDecoder` /
`TannerToMessageGraph` / `create_message_gnn_decoder`
(`models/message_gnn_decoder.py:155-582`) end to end, fixing NOTHING in the
reference code itself:

* the LLR-seeding bug (SURVEY.md §2 note 3: the 2-D one-hot
  `message_to_var_mapping` is misused as an index array via `[:, 0]`) is
  avoided by passing the 1-D edge->variable index vector, which the forward
  pass supports natively and handles correctly — this is the *intended*
  semantics the new framework implements;
* the always-on debug prints are silenced with stdout redirection;
* training follows the reference trainer protocol
  (`training/trainer.py:45-140`: SGD lr 1e-3, momentum 0.9, weight decay
  1e-4, batch 32 of RANDOM BITS — not codewords — mixed over SNR -2..6
  step 2, QPSK/AWGN through the reference channel with its sigma^2 = 1/SNR
  convention, mean-BCE loss from the GNN forward), with a configurable step
  budget (the reference default of 100 epochs x 5 SNRs = 500 steps is tiny;
  we train longer and record the loss curve so under-training is visible).

Evaluation regenerates the curve under BOTH protocols:
* all-zero codewords (the reference's own protocol,
  `comparative_evaluation.py:108-166`) — kept for faithfulness;
* random GF(2) codewords via this repo's encoder — the honest protocol for
  a non-sign-symmetric decoder (docs/MESSAGE_GNN.md "Evaluation honesty").

The loss curve is recorded IN FULL (every step). Round 3 recorded
`losses[::50]`, and because the trainer cycles the 5-point SNR mix
deterministically and 50 % 5 == 0, every sampled loss was the same SNR
point — systematically unrepresentative (VERDICT round 3, Weak #2).

Long runs checkpoint every 250 steps (model + optimizer + RNG + losses) so
they survive interruption; re-invoking with --resume continues, and
--eval-only produces the JSON from the latest checkpoint without training.

Usage:
    PYTHONPATH=. python tools/reference_gnn_curve.py --steps 12000 --resume
"""
from __future__ import annotations

import argparse
import contextlib
import io
import json
import math
import time
from pathlib import Path

REFERENCE_ROOT = "/root/reference"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="NR_2_0_4")
    ap.add_argument("--Z", type=int, default=4)
    ap.add_argument("--iterations", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--steps", type=int, default=2000,
                    help="training steps (reference default budget = 500)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--eval-trials", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint if present")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate the latest checkpoint")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint path (default results/ref_gnn_ckpt_<code>.pt)")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, REFERENCE_ROOT)
    import numpy as np
    import torch

    torch.set_num_threads(args.threads)

    from ldpc_neural_decoder.models.message_gnn_decoder import (
        create_message_gnn_decoder,
    )
    from ldpc_neural_decoder.utils.channel import (
        awgn_channel,
        qpsk_demodulate,
        qpsk_modulate,
    )
    from ldpc_neural_decoder.utils.ldpc_utils import (
        expand_base_matrix as ref_expand,
        load_base_matrix as ref_load,
    )

    from ldpc_tpu.codes import encoder_from_H

    torch.manual_seed(args.seed)
    base = ref_load(Path(REFERENCE_ROOT) / "5G LDPC CODES" / f"{args.code}.txt")
    H = torch.tensor(np.asarray(ref_expand(base, args.Z)), dtype=torch.float32)
    n = H.shape[1]

    quiet = contextlib.redirect_stdout(io.StringIO())
    with quiet:
        decoder, conv = create_message_gnn_decoder(
            H, num_iterations=args.iterations, hidden_dim=args.hidden,
            base_graph=base, Z=args.Z,
        )
        msg_types = conv.get_message_types(base, args.Z)
    # 1-D edge -> variable index vector (the forward pass's correct path;
    # the 2-D one-hot triggers the [:, 0] misuse, SURVEY.md §2 note 3).
    var_index = conv.message_to_var_mapping.argmax(dim=1).long()
    adj_v2c = conv.var_to_check_adjacency
    adj_c2v = conv.check_to_var_adjacency
    n_params = sum(p.numel() for p in decoder.parameters())
    print(f"reference GNN: E={len(conv.messages)} h={args.hidden} "
          f"T={args.iterations} params={n_params}", flush=True)

    encoder = encoder_from_H(np.asarray(H.numpy(), dtype=np.int8))
    rng = np.random.default_rng(args.seed)

    opt = torch.optim.SGD(decoder.parameters(), lr=args.lr, momentum=0.9,
                          weight_decay=1e-4)
    train_snrs = [-2.0, 0.0, 2.0, 4.0, 6.0]
    losses = []
    start_step = 0
    ckpt_path = Path(args.ckpt or f"results/ref_gnn_ckpt_{args.code.lower()}.pt")
    if (args.resume or args.eval_only) and ckpt_path.exists():
        state = torch.load(ckpt_path, weights_only=False)
        decoder.load_state_dict(state["model"])
        opt.load_state_dict(state["optimizer"])
        losses = state["losses"]
        start_step = state["step"]
        torch.set_rng_state(state["torch_rng"])
        print(f"resumed from {ckpt_path} at step {start_step}", flush=True)
    elif args.eval_only:
        raise SystemExit(f"--eval-only but no checkpoint at {ckpt_path}")

    t0 = time.time()
    for step in range(start_step, 0 if args.eval_only else args.steps):
        snr = train_snrs[step % len(train_snrs)]
        bits = torch.randint(0, 2, (args.batch, n), dtype=torch.float32)
        with torch.no_grad():
            llr = qpsk_demodulate(awgn_channel(qpsk_modulate(bits), snr), snr)
        with quiet:
            _, loss = decoder(llr, var_index, msg_types, adj_v2c, adj_c2v,
                              ground_truth=bits)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        if (step + 1) % 100 == 0:
            rate = (step + 1 - start_step) / (time.time() - t0)
            recent = sum(losses[-100:]) / 100
            print(f"[{time.strftime('%H:%M:%S')}] step {step + 1}/{args.steps} "
                  f"loss(100) {recent:.5f}  {rate:.2f} steps/s", flush=True)
        if (step + 1) % 250 == 0:
            torch.save({"model": decoder.state_dict(),
                        "optimizer": opt.state_dict(),
                        "losses": losses, "step": step + 1,
                        "torch_rng": torch.get_rng_state()}, ckpt_path)
    trained_steps = len(losses)

    snrs = [float(s) for s in range(-2, 7)]
    curves = {}
    for proto in ("zero_codewords", "random_codewords"):
        ber, fer, fer_ci = [], [], []
        for si, snr in enumerate(snrs):
            be = fe = frames = 0
            for t in range(args.eval_trials):
                torch.manual_seed(args.seed + 7000 + 100 * si + t)
                if proto == "zero_codewords":
                    bits = torch.zeros((args.batch, n))
                else:
                    import jax

                    cw = encoder.random_codewords(
                        jax.random.PRNGKey(args.seed + 100 * si + t), args.batch
                    )
                    bits = torch.tensor(np.asarray(cw), dtype=torch.float32)
                llr = qpsk_demodulate(awgn_channel(qpsk_modulate(bits), snr), snr)
                with torch.no_grad(), quiet:
                    probs = decoder(llr, var_index, msg_types, adj_v2c, adj_c2v)
                hard = (probs > 0.5).float()
                errs = (hard != bits).float().sum(dim=1)
                be += int(errs.sum()); fe += int((errs > 0).sum())
                frames += args.batch
            ber.append(be / (frames * n))
            fer.append(fe / frames)
            z = 1.96
            p = fe / frames
            d = 1 + z * z / frames
            c = (p + z * z / (2 * frames)) / d
            hw = z * math.sqrt(p * (1 - p) / frames + z * z / (4 * frames**2)) / d
            fer_ci.append([max(0.0, c - hw), min(1.0, c + hw)])
            print(f"[{time.strftime('%H:%M:%S')}] {proto} snr {snr:+.0f}: "
                  f"BER {ber[-1]:.3e} FER {fer[-1]:.3e}", flush=True)
        curves[proto] = {"ber": ber, "fer": fer, "fer_ci95": fer_ci}

    out = {
        "protocol": {
            "code": args.code, "Z": args.Z, "iterations": args.iterations,
            "hidden_dim": args.hidden, "params": n_params,
            "training": f"{trained_steps} steps SGD(lr={args.lr}, momentum=0.9, "
                        f"wd=1e-4), batch {args.batch} random bits, "
                        f"SNR mix {train_snrs} (reference trainer protocol; "
                        f"reference default budget = 500 steps)",
            "eval_trials": args.eval_trials, "eval_batch": args.batch,
            "source": "ldpc_neural_decoder.models.message_gnn_decoder @ "
                      "/root/reference (unmodified), torch " + torch.__version__,
            "seeding": "1-D var-index mapping (intended semantics; avoids "
                       "the [:, 0] one-hot misuse, SURVEY.md §2 note 3)",
        },
        "snr_range": snrs,
        "train_loss_first100": sum(losses[:100]) / min(len(losses), 100),
        "train_loss_last100": sum(losses[-100:]) / min(len(losses), 100),
        # Full per-step loss record (round 3's losses[::50] aliased onto a
        # single SNR point of the 5-cycle — VERDICT r3 Weak #2).
        "train_losses": losses,
        "train_loss_block_means100": [
            sum(losses[i:i + 100]) / len(losses[i:i + 100])
            for i in range(0, len(losses), 100)
        ],
        "curves": curves,
        "wall_seconds": round(time.time() - t0, 1),
    }
    dest = Path(args.out or f"results/reference_torch_gnn_{args.code.lower()}.json")
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=2))
    print(f"wrote {dest}", flush=True)


if __name__ == "__main__":
    main()
