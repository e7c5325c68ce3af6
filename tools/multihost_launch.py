"""Real multi-process `jax.distributed` execution on CPU.

The reference has no distributed layer (SURVEY.md §2); this framework's
multi-chip path is SPMD over a `jax.sharding.Mesh`.  Everything up to round
1 exercised that mesh inside ONE process (8 virtual CPU devices).  This
launcher exercises the actual multi-process runtime — coordinator service,
per-process device visibility, cross-process gloo collectives — the way a
multi-host TPU pod launch would:

* spawns N local worker processes, each with K virtual CPU devices;
* each worker calls `ldpc_tpu.parallel.distributed_init` (loud failures),
  builds a global ('data', 'model') mesh over all N*K devices, runs an
  `mc_sweep` of the min-sum decoder and `steps` sharded train steps on the
  tied neural decoder;
* workers dump results; the launcher asserts all workers agree AND that
  the numbers are bit-identical to a 1-process run with the same N*K
  global devices (the deterministic re-partition property, SURVEY.md §7
  hard part 5 — data is generated inside jit from partitionable threefry
  keys, so sharding layout cannot change the realizations).

Usage:
    PYTHONPATH=. python tools/multihost_launch.py --num-processes 2 \
        --devices-per-process 4
Exit code 0 = every assertion passed.
"""
from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path


def find_free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# ---------------------------------------------------------------------------
# Worker
# ---------------------------------------------------------------------------


def run_workload_z32(mesh) -> dict:
    """Production-shape workload (VERDICT r2 item 8): the Z=32 flagship code
    through the real process boundary — a sharded min-sum MC sweep at the
    shapes where sharding bugs live, plus the `shard_decode` fused-kernel
    path (Pallas interpret mode on CPU; the kernel is a custom call the
    partitioner cannot split, so it must run inside shard_map — see
    `ldpc_tpu.parallel.sharding.shard_decode`)."""
    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.classical import decode_min_sum
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.ops.pallas_minsum import make_fused_minsum
    from ldpc_tpu.parallel.sharding import mc_sweep, shard_decode
    from ldpc_tpu.utils import bpsk_awgn_llr

    qc = qc_layout(get_base_graph("nr_2_0_32"), 32)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z  # 1664

    sweep = mc_sweep(
        lambda llr: decode_min_sum(llr, plan, 10, 0.75).bits,
        plan,
        snr_range=[-2.0, 0.0],
        batch_size=16,
        num_trials=2,
    )

    # Fused-kernel serving path across the process boundary.  The LLR batch
    # is generated inside jit from a partitionable threefry key, so every
    # process sees the same global realization; bits.sum() is then an
    # integer checksum that must be bit-identical across any partitioning.
    fused = make_fused_minsum(qc, max_iterations=5, alpha=0.75,
                              batch_tile=8, interpret=True)
    ndev = len(jax.devices())
    B = 2 * ndev

    @jax.jit
    def make_llr(key):
        return bpsk_awgn_llr(key, jnp.zeros((B, n)), 0.0)

    decode = shard_decode(lambda llr: fused(llr)[0], mesh)
    with mesh:
        bits = decode(make_llr(jax.random.PRNGKey(11)))
    return {
        "sweep": sweep,
        "fused_bits_checksum": int(jnp.asarray(bits).sum()),
        "fused_batch": B,
    }


def run_workload(mesh, steps: int) -> dict:
    """The distributed workload: sharded MC sweep + sharded training."""
    import jax
    import jax.numpy as jnp
    import optax

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models import make_tied_decoder
    from ldpc_tpu.models.classical import decode_min_sum
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.parallel.sharding import make_sharded_train_step, mc_sweep

    plan = qc_msg.make_plan(qc_layout(get_base_graph("toy_4x8"), 4))
    n = plan.C * plan.Z

    sweep = mc_sweep(
        lambda llr: decode_min_sum(llr, plan, 5, 0.75).bits,
        plan,
        snr_range=[0.0, 4.0],
        batch_size=16,
        num_trials=2,
    )

    model = make_tied_decoder(num_iterations=2, depth_L=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, n)), plan)
    tx = optax.sgd(1e-2, momentum=0.9)
    opt_state = tx.init(params)
    step = make_sharded_train_step(model, plan, tx, mesh, batch_size=16)
    losses = []
    with mesh:
        for i in range(steps):
            key = jax.random.fold_in(jax.random.PRNGKey(7), i)
            params, opt_state, loss = step(params, opt_state, key, jnp.float32(2.0))
            losses.append(float(loss))
    leaves = jax.tree_util.tree_leaves(params)
    param_sum = float(sum(jnp.sum(jnp.abs(x)).astype(jnp.float64) for x in leaves))
    return {"sweep": sweep, "losses": losses, "param_abs_sum": param_sum}


def worker(args) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices_per_process}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from ldpc_tpu.parallel import distributed_init, make_mesh

    if args.num_processes > 1:
        distributed_init(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        assert jax.process_count() == args.num_processes, jax.process_count()

    expected = args.num_processes * args.devices_per_process
    assert len(jax.devices()) == expected, (len(jax.devices()), expected)
    mesh = make_mesh(devices=jax.devices())

    if args.workload == "z32":
        out = run_workload_z32(mesh)
    else:
        out = run_workload(mesh, steps=args.steps)
    out["process_count"] = jax.process_count()
    out["num_devices"] = len(jax.devices())
    dest = Path(args.out_dir) / f"worker_{args.process_id}.json"
    dest.write_text(json.dumps(out))
    if args.num_processes > 1:
        jax.distributed.shutdown()


# ---------------------------------------------------------------------------
# Launcher
# ---------------------------------------------------------------------------


def launch(num_processes: int, devices_per_process: int, steps: int, timeout: int,
           workload: str = "toy") -> dict:
    """Run the workload at N processes and at 1 process; assert identical.

    Returns the comparison dict (also printed as JSON on stdout).
    """
    with tempfile.TemporaryDirectory() as td:
        port = find_free_port()
        env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
        env["PYTHONPATH"] = str(Path(__file__).resolve().parent.parent) + os.pathsep + env.get(
            "PYTHONPATH", ""
        )

        def spawn(np_, pid, dev_per_proc):
            return subprocess.Popen(
                [sys.executable, __file__, "--worker", "--workload", workload,
                 "--num-processes", str(np_), "--process-id", str(pid),
                 "--devices-per-process", str(dev_per_proc),
                 "--port", str(port), "--steps", str(steps), "--out-dir", td],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )

        procs = [spawn(num_processes, i, devices_per_process) for i in range(num_processes)]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            logs.append(out)
            if p.returncode != 0:
                raise SystemExit(
                    f"worker failed (rc {p.returncode}):\n" + "\n".join(logs)
                )
        multi = [json.loads((Path(td) / f"worker_{i}.json").read_text())
                 for i in range(num_processes)]

        # Single-process reference with the same number of GLOBAL devices.
        sp = spawn(1, 0, devices_per_process * num_processes)
        out, _ = sp.communicate(timeout=timeout)
        if sp.returncode != 0:
            raise SystemExit(f"single-process reference failed:\n{out}")
        single = json.loads((Path(td) / "worker_0.json").read_text())

    # Hard per-workload contract: a workload that silently stops emitting a
    # metric must fail here, not skip its checks.
    required = {
        "toy": ("sweep", "losses", "param_abs_sum"),
        "z32": ("sweep", "fused_bits_checksum", "fused_batch"),
    }[workload]
    exact_keys = [k for k in required if k not in ("losses", "param_abs_sum")]
    for i, w in enumerate(multi):
        assert w["process_count"] == num_processes, w
        for k in required:
            assert k in w, f"worker {i} result missing {k!r}"
        for k in exact_keys:
            assert w[k] == multi[0][k], f"worker {i} disagrees on {k}"
        for k in ("losses", "param_abs_sum"):
            if k in required:
                assert w[k] == multi[0][k], f"worker {i} disagrees on {k}"
    # MC error counts and decode-bit checksums are integer-valued sums: the
    # N-process run must be a bit-identical re-partition of the
    # single-process one.  Scalar float reductions (loss mean, param
    # checksum) legitimately reorder across the process boundary (gloo
    # all-reduce vs in-process reduction), so they get a tight ulp-level
    # tolerance instead of equality.
    assert multi[0]["sweep"] == single["sweep"], (multi[0]["sweep"], single["sweep"])
    if "fused_bits_checksum" in multi[0]:
        assert multi[0]["fused_bits_checksum"] == single["fused_bits_checksum"], (
            multi[0]["fused_bits_checksum"], single["fused_bits_checksum"]
        )
    for a, b in zip(multi[0].get("losses", []), single.get("losses", []),
                    strict=True):
        assert abs(a - b) <= 1e-5 * max(1.0, abs(b)), (a, b)
    if "param_abs_sum" in multi[0]:
        pa, pb = multi[0]["param_abs_sum"], single["param_abs_sum"]
        assert abs(pa - pb) <= 1e-5 * max(1.0, abs(pb)), (pa, pb)
    return {
        "ok": True,
        "workload": workload,
        "num_processes": num_processes,
        "global_devices": num_processes * devices_per_process,
        "sweep": multi[0]["sweep"],
        "losses": multi[0].get("losses"),
        "fused_bits_checksum": multi[0].get("fused_bits_checksum"),
        "sweep_bit_identical_to_single_process": True,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--workload", default="toy", choices=["toy", "z32"],
                    help="toy = 4x8 sweep + sharded training; z32 = the "
                         "NR BG2 Z=32 flagship sweep + fused-kernel "
                         "shard_decode path")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        result = launch(args.num_processes, args.devices_per_process, args.steps,
                        args.timeout, workload=args.workload)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
