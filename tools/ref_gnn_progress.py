"""Extract a compact, committable progress record from the live
reference-GNN training checkpoint (ADVICE r4: the 1 MB .pt binary is
overwritten every 250 steps by `tools/reference_gnn_curve.py`, so
committing it repeatedly bloats history; the loss curve JSON below is the
durable record, and only FINAL checkpoints get committed as binaries).

Usage: PYTHONPATH=. python tools/ref_gnn_progress.py [--code NR_2_0_4]
Writes results/ref_gnn_progress_<code>.json with the step count and the
per-100-step block-mean loss curve.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="NR_2_0_4")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--note", default=None,
                    help="free-form provenance note recorded in the JSON")
    args = ap.parse_args()

    import torch

    ckpt_path = Path(args.ckpt or f"results/ref_gnn_ckpt_{args.code.lower()}.pt")
    state = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    losses = [float(x) for x in state["losses"]]
    out = {
        "checkpoint": str(ckpt_path),
        "step": int(state["step"]),
        "extracted_at": time.strftime("%Y-%m-%d %H:%M:%S"),
        "resume_command": "PYTHONPATH=. python tools/reference_gnn_curve.py "
                          "--steps 12000 --resume",
        "loss_block_means100": [
            round(sum(losses[i:i + 100]) / len(losses[i:i + 100]), 6)
            for i in range(0, len(losses), 100)
        ],
        "loss_last100": round(sum(losses[-100:]) / min(len(losses), 100), 6),
    }
    if args.note:
        out["note"] = args.note
    dest = Path(f"results/ref_gnn_progress_{args.code.lower()}.json")
    dest.write_text(json.dumps(out, indent=2))
    print(f"wrote {dest}: step {out['step']}, loss(100) {out['loss_last100']}")


if __name__ == "__main__":
    main()
