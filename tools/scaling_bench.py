"""Multi-chip scaling benchmark: decoded bits/s at 1..N chips.

Shards the MC decode batch over a growing data-parallel mesh and reports
throughput + scaling efficiency per device count.  On a 1-chip system this
degenerates to the single-chip number; on a pod slice it measures the
BASELINE.json ">=90% scaling efficiency" target (the only cross-chip traffic
is the final error-count psum, so efficiency should be near 1).

Note: on a virtual CPU mesh (xla_force_host_platform_device_count) the
"devices" share one host's cores, so measured efficiency collapses by
construction — only real multi-chip runs produce meaningful efficiency.

Run:  PYTHONPATH=. python tools/scaling_bench.py [--batch-per-device 4096]
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.classical import decode_min_sum
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.parallel import make_mesh
    from ldpc_tpu.parallel.sharding import make_mc_trial

    plan = qc_msg.make_plan(qc_layout(get_base_graph("nr_2_0_32"), 32))
    n = plan.C * plan.Z
    devices = jax.devices()
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    results = []
    base = None
    for nd in counts:
        mesh = make_mesh(data=nd, model=1, devices=devices[:nd])
        B = args.batch_per_device * nd
        trial = make_mc_trial(
            lambda llr: decode_min_sum(llr, plan, args.iters, 0.75).bits, n, B, mesh,
            modulation="bpsk",
        )
        with mesh:
            out = trial(jax.random.PRNGKey(0), jnp.float32(3.0))
            _ = [float(x) for x in out]  # warm + real sync
            t0 = time.time()
            outs = [trial(jax.random.PRNGKey(i + 1), jnp.float32(3.0)) for i in range(args.reps)]
            _ = [float(x) for x in outs[-1]]
            dt = (time.time() - t0) / args.reps
        bps = B * n / dt
        if base is None:
            base = bps
        eff = bps / (base * nd)
        results.append({"devices": nd, "bits_per_s": bps, "scaling_efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))


if __name__ == "__main__":
    main()
