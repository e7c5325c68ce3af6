"""Profiling hooks: jax.profiler traces and roofline estimates.

The reference's only performance instrumentation is wall-clock timing around
workflow subprocesses (``run_workflow.py:67-84``).  This wraps
`jax.profiler` for on-demand device traces and provides roofline estimates
for the decode kernels so measured throughput can be judged against
hardware limits (BASELINE.json requires kernels at "speed of light").
"""
from __future__ import annotations

import contextlib
from dataclasses import dataclass
from pathlib import Path

import jax

from ldpc_tpu.codes.edge_layout import QCLayout


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/ldpc_tpu_trace"):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield str(log_dir)
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (host-side annotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass(frozen=True)
class MinSumRoofline:
    """Operation/byte counts per decode iteration for a QC code."""

    vpu_element_ops_per_frame: float  # element-wise ops, all iterations
    hbm_bytes_per_frame: float  # LLR in + bits out (fused kernel floor)

    def bound_bits_per_s(self, n_bits: int, vpu_ops_per_s: float = 3.8e12,
                         hbm_bytes_per_s: float = 8.1e11) -> dict[str, float]:
        compute = n_bits / (self.vpu_element_ops_per_frame / vpu_ops_per_s)
        memory = n_bits / (self.hbm_bytes_per_frame / hbm_bytes_per_s)
        return {"compute_bound_bits_per_s": compute, "memory_bound_bits_per_s": memory}


def minsum_roofline(qc: QCLayout, iterations: int) -> MinSumRoofline:
    """Estimate for the fused VMEM-resident kernel (see ops/pallas_minsum).

    Per iteration per frame: ~8 ops per edge for the running min/2nd-min/
    sign reduction, ~7 for the leave-one-out writeback, ~1 add per edge for
    column sums, ~2 per edge for parity — about 18 element ops per edge.
    """
    K, Z, C = qc.num_base_edges, qc.Z, qc.num_base_cols
    edges = K * Z
    ops = iterations * edges * 18.0
    bytes_ = (C * Z) * 4.0 * 2  # LLR read + bits written once per frame
    return MinSumRoofline(vpu_element_ops_per_frame=ops, hbm_bytes_per_frame=bytes_)
