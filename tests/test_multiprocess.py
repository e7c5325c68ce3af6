"""Real multi-process `jax.distributed` execution (CPU, gloo collectives).

Complements tests/test_parallel.py (single-process virtual mesh) by
exercising the actual process boundary: coordinator service, per-process
device visibility, cross-process collectives.  See tools/multihost_launch.py.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _env():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_launch_matches_single_process():
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_launch.py"),
         "--num-processes", "2", "--devices-per-process", "4", "--steps", "2"],
        env=_env(), capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["num_processes"] == 2
    assert result["global_devices"] == 8
    assert result["sweep_bit_identical_to_single_process"]


def test_two_process_z32_flagship_workload():
    """The Z=32 production code through the real process boundary: sharded
    min-sum sweep at flagship shapes plus the fused-kernel `shard_decode`
    path (interpret mode), bit-identical to a single-process run —
    VERDICT r2 item 8."""
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_launch.py"),
         "--num-processes", "2", "--devices-per-process", "2",
         "--workload", "z32"],
        env=_env(), capture_output=True, text=True, timeout=540,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"] and result["workload"] == "z32"
    assert result["sweep_bit_identical_to_single_process"]
    assert result["fused_bits_checksum"] is not None


def test_distributed_init_fails_loudly():
    """A bad coordinator must NOT silently fall back to single-process.

    The XLA coordination client terminates the process with a fatal log on
    registration deadline (before a Python exception can surface), so "loud"
    here means: nonzero exit, never reaching the code after init.
    """
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
from ldpc_tpu.parallel import distributed_init
distributed_init(coordinator_address="localhost:9",  # discard port, nothing listens
                 num_processes=2, process_id=1, initialization_timeout=3)
print("SILENT")  # must be unreachable
"""
    out = subprocess.run([sys.executable, "-c", code], env=_env(),
                         capture_output=True, text=True, timeout=180)
    assert out.returncode != 0, out.stdout + out.stderr
    assert "SILENT" not in out.stdout, out.stdout
