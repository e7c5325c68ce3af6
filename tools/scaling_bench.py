"""Multi-chip scaling benchmark: decoded bits/s at 1..N devices.

Shards the MC decode batch over a growing data-parallel mesh and reports
throughput + scaling efficiency per device count.  On a 1-chip system this
degenerates to the single-chip number; on a pod slice it measures the
BASELINE.json ">=90% scaling efficiency" target (the only cross-chip traffic
is the final error-count psum, so efficiency should be near 1).  On TPU the
decode runs the fused Pallas min-sum kernel inside ``shard_map`` (the
production `shard_decode` path); on CPU the XLA scan path (the Pallas
kernel is TPU-only).

Note: on a virtual CPU mesh (``--force-cpu-devices N``) the "devices" share
one host's cores, so measured efficiency collapses by construction — that
run validates the *mechanics* end to end (mesh build, shard_map decode,
psum counts), not efficiency.  Only real multi-chip runs produce meaningful
efficiency numbers; this tool is the one-command entry point for that run
on a pod slice.

Runs merge into one artifact keyed by platform:

    PYTHONPATH=. python tools/scaling_bench.py                 # real chip(s)
    PYTHONPATH=. python tools/scaling_bench.py --force-cpu-devices 8

Artifact: results/scaling_bench.json (VERDICT r3 item 7).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=None,
                    help="default 65536 on TPU (decode-dominated; matches the "
                         "bare-kernel bench batch), 2048 on CPU")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="results/scaling_bench.json")
    ap.add_argument("--force-cpu-devices", type=int, default=0,
                    help="force a virtual N-device CPU platform (mechanics "
                         "validation; efficiency is meaningless there)")
    args = ap.parse_args()

    if args.force_cpu_devices:
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.force_cpu_devices}"
        ).strip()
        import jax

        # The host sitecustomize force-registers the TPU platform; env vars
        # alone cannot deselect it (tests/conftest.py does the same).
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.classical import decode_min_sum
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.parallel import make_mesh
    from ldpc_tpu.parallel.sharding import make_mc_trial, shard_decode

    qc = qc_layout(get_base_graph("nr_2_0_32"), 32)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    devices = jax.devices()
    on_tpu = jax.default_backend() == "tpu"
    if args.batch_per_device is None:
        args.batch_per_device = 65536 if on_tpu else 2048
    fused = None
    if on_tpu:
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum

        fused = make_fused_minsum(qc, args.iters, 0.75, batch_tile=128)
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    points = []
    base = None
    for nd in counts:
        mesh = make_mesh(data=nd, model=1, devices=devices[:nd])
        B = args.batch_per_device * nd
        if fused is not None:
            decode = shard_decode(lambda llr: fused(llr)[0], mesh)
        else:
            decode = lambda llr: decode_min_sum(llr, plan, args.iters, 0.75).bits
        trial = make_mc_trial(decode, n, B, mesh, modulation="bpsk")

        # Decode-only region: pre-generated LLRs, so the timed work is the
        # kernel alone — this is the pod-slice efficiency numerator/
        # denominator (VERDICT r4 weak #4: the full-trial number folds in
        # channel simulation + per-dispatch tunnel overhead, which at small
        # batches dominates and would make an efficiency claim measure
        # harness scaling, not decode scaling).
        from ldpc_tpu.utils import bpsk_awgn_llr

        @jax.jit
        def make_llr(key):
            return bpsk_awgn_llr(key, jnp.zeros((B, n)), 3.0)

        # Every timed fn returns SCALARS: the sync-by-value-fetch the tunnel
        # requires must not pull the (B, n) LLR tensor to the host (hundreds
        # of MB inside the timing window).
        channel_probe = jax.jit(
            lambda key: bpsk_awgn_llr(key, jnp.zeros((B, n)), 3.0).sum()
        )
        decode_sum = jax.jit(lambda llr: decode(llr).sum())

        def timed(fn, inputs):
            """Mean seconds/call over distinct per-rep inputs (identical
            dispatches can be elided through the tunnel)."""
            out = fn(inputs[0])
            _ = [float(x) for x in jax.tree_util.tree_leaves(out)]  # warm+sync
            t0 = time.time()
            outs = [fn(x) for x in inputs]
            _ = [float(x) for x in jax.tree_util.tree_leaves(outs[-1])]
            return (time.time() - t0) / len(inputs)

        with mesh:
            llrs = [make_llr(jax.random.PRNGKey(i)) for i in range(args.reps)]
            _ = [x.block_until_ready() for x in llrs]
            dt_decode = timed(decode_sum, llrs)
            dt_channel = timed(
                channel_probe,
                [jax.random.PRNGKey(100 + i) for i in range(args.reps)],
            )
            dt_full = timed(
                lambda key: trial(key, jnp.float32(3.0)),
                [jax.random.PRNGKey(200 + i) for i in range(args.reps)],
            )
        bps = B * n / dt_decode
        full_bps = B * n / dt_full
        if base is None:
            base = bps
        eff = bps / (base * nd)
        points.append({
            "devices": nd,
            "decode_bits_per_s": round(bps, 1),
            "decode_bits_per_s_per_device": round(bps / nd, 1),
            "scaling_efficiency": round(eff, 3),
            "full_pipeline_bits_per_s": round(full_bps, 1),
            "split_ms": {"decode": round(dt_decode * 1e3, 2),
                         "channel": round(dt_channel * 1e3, 2),
                         "full_trial": round(dt_full * 1e3, 2)},
        })
        print(json.dumps(points[-1]), flush=True)

    key = "tpu" if on_tpu else f"cpu_virtual{len(devices)}"
    payload = {
        "platform": key,
        "device_kind": devices[0].device_kind,
        "kernel": "pallas_fused_shard_map" if fused is not None else "xla_scan",
        "code": "nr_2_0_32",
        "Z": 32,
        "iterations": args.iters,
        "batch_per_device": args.batch_per_device,
        "reps": args.reps,
        "efficiency_meaningful": on_tpu and len(devices) > 1,
        "efficiency_basis": "decode-only region (pre-generated LLRs); "
                            "full-pipeline numbers recorded per point "
                            "with a decode/channel/full split",
        "measured": time.strftime("%Y-%m-%d"),
        "points": points,
    }
    dest = Path(args.out)
    merged = json.loads(dest.read_text()) if dest.exists() else {}
    merged[key] = payload
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(merged, indent=2))
    print(f"wrote {dest} [{key}]", flush=True)


if __name__ == "__main__":
    main()
