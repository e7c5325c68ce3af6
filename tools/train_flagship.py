"""Long-budget flagship training for the message-GNN decoder family.

Trains on the real TPU with the scan-fused production path
(``LDPCDecoderTrainer.train_steps``) and checkpoints the FULL training
state (params + optimizer moments + step + data key) after every chunk, so
the run can be killed at any moment — to free the TPU tunnel for other
jobs — and resumed with the identical trajectory:

    PYTHONPATH=. python tools/train_flagship.py --steps 60000 &
    ...
    kill <pid>                      # checkpoint already on disk
    PYTHONPATH=. python tools/train_flagship.py --steps 60000   # resumes

Default recipe: the corrected min-sum GNN (classical min-sum skeleton +
zero-init GNN corrections, `ldpc_tpu/models/message_gnn.py`) on NR BG2 Z=4,
random codewords, SNR uniform in [-3, 1] dB, Adam + cosine decay.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path


def build_model(name: str, plan, iters: int, hidden: int, multiloss: bool = False,
                remat: bool = False):
    from ldpc_tpu.models.message_gnn import (
        create_corrected_minsum_gnn_decoder,
        create_message_gnn_decoder,
    )
    from ldpc_tpu.models.neural_min_sum import NeuralMinSumDecoder

    if name == "corrected":
        return create_corrected_minsum_gnn_decoder(
            plan, num_iterations=iters, hidden_dim=hidden, input_injection=True,
            multiloss=multiloss, remat=remat,
        )
    if name == "gnn":
        return create_message_gnn_decoder(
            plan, num_iterations=iters, hidden_dim=hidden, input_injection=True,
            multiloss=multiloss, remat=remat,
        )
    if name == "oms_per_iter":
        if remat:
            raise SystemExit(
                "--remat only applies to the GNN family (corrected/gnn); "
                "the NeuralMinSumDecoder scan path does not support it"
            )
        return NeuralMinSumDecoder(
            num_iterations=iters, depth_L=2, weight_sharing="edge",
            learnable_alpha=True, learnable_offset=True, per_iteration=True,
            loss_mode="mean",
        )
    raise SystemExit(f"unknown --model {name!r}")


def grow_merge(dst: dict, src: dict) -> dict:
    """Copy every leaf of ``src`` into ``dst`` whose path and shape match.

    In-place on ``dst`` (a flax state dict of the DEEPER model). Leaves
    only in ``dst`` — e.g. the extra per-iteration layers of a grown
    T=20 model — keep their fresh (zero-init) values, so the grown
    decoder starts as [donor corrections] + [pure min-sum] and is at or
    above donor quality before any training. Returns copy statistics.
    """
    import numpy as np

    stats = {"copied": 0, "kept_fresh": 0}

    def merge(dst, src):
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict) and isinstance(dst[k], dict):
                merge(dst[k], v)
            elif (np.shape(dst[k]) == np.shape(v)
                  and not isinstance(dst[k], dict)):
                dst[k] = np.asarray(v)
                stats["copied"] += 1

    def count(d):
        return sum(count(v) if isinstance(v, dict) else 1 for v in d.values())

    merge(dst, src)
    stats["kept_fresh"] = count(dst) - stats["copied"]
    return stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="corrected")
    ap.add_argument("--code", default="nr_2_0_4")
    ap.add_argument("--Z", type=int, default=4)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize GNN layers on backward (per-layer "
                         "nn.remat): drops intra-layer MLP activations; "
                         "memory scales with the T layer boundaries only; "
                         "required for deep unrolls (T >= 20) at full batch")
    ap.add_argument("--multiloss", action="store_true",
                    help="BCE at every iteration's marginals (deep-unrolled "
                         "training aid; decode output unchanged)")
    ap.add_argument("--steps", type=int, default=60000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-schedule", default="cosine", choices=["cosine", "constant"],
                    help="'constant' with a low --lr is the reduced-LR "
                         "fine-tune path: warm-starting a trained model with "
                         "the default schedule would restart the full cosine "
                         "at lr 1e-3 and destabilize it (round-3 floor-fix "
                         "failure, PARITY.md)")
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--snr-lo", type=float, default=-3.0)
    ap.add_argument("--snr-hi", type=float, default=1.0)
    ap.add_argument("--scan", type=int, default=200)
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off); recommended "
                         "for deep (iters >= 10) corrected models")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--init-from", default=None,
                    help="warm-start params from a saved model .msgpack "
                         "(fresh optimizer state; used when only final "
                         "weights, not a full state checkpoint, exist)")
    ap.add_argument("--grow-from", default=None,
                    help="warm-start from a SHALLOWER model .msgpack of the "
                         "same family: every parameter subtree whose name and "
                         "shape match is copied (e.g. the T=10 flagship's "
                         "per-iteration layers 0-9 into a T=20 model); the "
                         "new layers keep their fresh zero-init correction "
                         "projections, so the grown decoder starts as "
                         "[flagship corrections for the first 10 iterations] "
                         "+ [pure min-sum for the rest] — at or above "
                         "flagship quality before any training")
    ap.add_argument("--tag", default=None, help="artifact name stem (default: model_code)")
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--ckpt-backend", default="msgpack", choices=["msgpack", "orbax"],
                    help="orbax = step-numbered CheckpointManager directories with "
                         "retention; msgpack = single-file save_state (default, "
                         "matches the committed round-1 artifacts)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import encoder_from_H, expand_base_matrix, get_base_graph, qc_layout
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.training import LDPCDecoderTrainer

    # Default tags match the committed artifact names in results/ so a bare
    # re-invocation resumes the existing run instead of silently starting a
    # fresh one under a new stem.
    stems = {"corrected": "corrected_gnn", "gnn": "message_gnn"}
    tag = args.tag or f"{stems.get(args.model, args.model)}_{args.code}"
    out_dir = Path(args.out_dir)
    state_path = out_dir / f"{tag}_state.msgpack"
    model_path = out_dir / f"{tag}.msgpack"

    bg = get_base_graph(args.code)
    qc = qc_layout(bg, args.Z)
    plan = qc_msg.make_plan(qc)
    enc = encoder_from_H(expand_base_matrix(bg, args.Z))
    model = build_model(args.model, plan, args.iters, args.hidden, args.multiloss,
                        args.remat)
    trainer = LDPCDecoderTrainer(model, plan, seed=args.seed, encoder=enc)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(trainer.params))
    print(f"[{time.strftime('%H:%M:%S')}] backend={jax.default_backend()} "
          f"model={args.model} code={args.code} Z={args.Z} iters={args.iters} "
          f"hidden={args.hidden} params={n_params}", flush=True)

    ckpt_mgr = None
    if args.ckpt_backend == "orbax":
        from ldpc_tpu.training.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(out_dir / f"{tag}_ckpt", max_to_keep=3)
        if ckpt_mgr.latest_step() is not None:
            trainer.load_checkpoint(ckpt_mgr)
            print(f"resumed from orbax step {trainer.step}", flush=True)
        elif args.init_from:
            trainer.load_model(args.init_from)
            print(f"warm-started params from {args.init_from} "
                  f"(fresh optimizer, step 0)", flush=True)
    elif state_path.exists():
        trainer.load_state(state_path)
        print(f"resumed from {state_path} at step {trainer.step}", flush=True)
    elif args.init_from:
        trainer.load_model(args.init_from)
        print(f"warm-started params from {args.init_from} "
              f"(fresh optimizer, step 0)", flush=True)
    elif args.grow_from:
        from flax import serialization as fser

        payload = fser.msgpack_restore(Path(args.grow_from).read_bytes())
        fresh = fser.to_state_dict(trainer.params)
        stats = grow_merge(fresh, payload["params"])
        trainer.params = fser.from_state_dict(trainer.params, fresh)
        print(f"grown from {args.grow_from}: {stats['copied']} tensors copied, "
              f"{stats['kept_fresh']} fresh (fresh optimizer, step 0)", flush=True)

    t0 = time.time()
    last = [trainer.step, t0]

    def checkpoint() -> None:
        if ckpt_mgr is not None:
            trainer.save_checkpoint(ckpt_mgr)
        else:
            trainer.save_state(state_path)
        now = time.time()
        rate = (trainer.step - last[0]) / max(now - last[1], 1e-9)
        last[0], last[1] = trainer.step, now
        k = min(len(trainer.train_losses), 200)
        loss = sum(trainer.train_losses[-k:]) / max(k, 1)
        print(f"[{time.strftime('%H:%M:%S')}] step {trainer.step}/{args.steps} "
              f"loss(200) {loss:.5f}  {rate:.1f} steps/s", flush=True)

    trainer.train_steps(
        num_steps=args.steps, batch_size=args.batch, learning_rate=args.lr,
        snr_range=[args.snr_lo, args.snr_hi], data_mode="random_codewords",
        optimizer="adam", weight_decay=0.0, grad_clip=args.grad_clip,
        scan_steps=args.scan,
        lr_schedule=args.lr_schedule, warmup_steps=args.warmup,
        checkpoint_fn=checkpoint,
    )
    trainer.save_model(model_path)
    print(f"done in {time.time() - t0:.0f}s -> {model_path}", flush=True)

    # Quick sanity eval (full curves come from tools/make_curves.py).
    snrs = [-2.0, 0.0, 2.0]
    bers, fers = trainer.evaluate_snr_range(
        snrs, batch_size=1024, num_trials=20, use_encoder=True
    )
    for s, b, f in zip(snrs, bers, fers):
        print(f"  SNR {s:+.0f} dB: BER {b:.3e} FER {f:.3e}", flush=True)


if __name__ == "__main__":
    main()
