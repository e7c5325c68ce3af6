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


@dataclass(frozen=True)
class GNNRoofline:
    """MXU/VPU/HBM accounting per frame for the fused message-GNN kernel."""

    mxu_flops_per_frame: float  # bf16 matmul flops, all iterations
    vpu_element_ops_per_frame: float  # group means, relu, residual, output
    hbm_bytes_per_frame: float  # LLR in + soft bits out (weights VMEM-resident)
    matmul_m: int  # per-matmul output rows (= hidden dim): MXU fill factor

    def bound_bits_per_s(self, n_bits: int, mxu_flops_per_s: float = 1.97e14,
                         vpu_ops_per_s: float = 3.8e12,
                         hbm_bytes_per_s: float = 8.1e11) -> dict[str, float]:
        """Throughput bounds on one v5e core (defaults: 197 bf16 TFLOPs MXU,
        3.8 Tops VPU, 810 GB/s HBM).

        ``mxu_bound_bits_per_s`` assumes a fully-fed MXU.  The kernel's
        per-message matmuls are (h, h) @ (h, lanes): with h < 128 both the
        output-row and contraction dims underfill the 128x128 systolic
        array, so ``mxu_bound_achievable`` scales the peak by (h/128)^2 —
        the fill-factor ceiling for this tiling, before any overhead.
        """
        mxu = n_bits / (self.mxu_flops_per_frame / mxu_flops_per_s)
        fill = min(self.matmul_m / 128.0, 1.0) ** 2
        vpu = n_bits / (self.vpu_element_ops_per_frame / vpu_ops_per_s)
        hbm = n_bits / (self.hbm_bytes_per_frame / hbm_bytes_per_s)
        return {
            "mxu_bound_bits_per_s": mxu,
            "mxu_bound_achievable_bits_per_s": mxu * fill,
            "vpu_bound_bits_per_s": vpu,
            "memory_bound_bits_per_s": hbm,
        }


def gnn_roofline(qc: QCLayout, hidden_dim: int, iterations: int,
                 input_injection: bool = False) -> GNNRoofline:
    """Mirror of the fused GNN kernel's actual op counts (ops/pallas_gnn.py
    `_kernel`), per frame:

    * matmuls per iteration: 4 per base edge (two first-layer feature
      contractions + two second layers) + per-column precomputes (1, or 3
      with input injection) + per-row precompute — each (h, h) @ (h, Z)
      worth of work per frame = 2 h^2 Z flops;
    * VPU: group means (~2 adds per edge per hidden row), relu/residual
      (~4), seed/output (~3).
    """
    K, Z, C, R = qc.num_base_edges, qc.Z, qc.num_base_cols, qc.num_base_rows
    h = hidden_dim
    per_col = 3 if input_injection else 1
    matmuls = 4 * K + per_col * C + R
    mxu = iterations * matmuls * 2.0 * h * h * Z
    vpu = iterations * K * Z * h * 6.0 + K * Z * h * 3.0
    n = C * Z
    return GNNRoofline(
        mxu_flops_per_frame=mxu,
        vpu_element_ops_per_frame=vpu,
        hbm_bytes_per_frame=2 * n * 4.0,
        matmul_m=h,
    )


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
