"""Core QC message-passing operations (XLA path).

These are the TPU-native replacements for the reference's gather-based
"kernels" (``models/layers.py:5-125`` CheckLayer/VariableLayer) and its
per-edge Python loops (``models/traditional_decoders.py:60-108``):

* Messages are stored **var-aligned** as (K, Z, B) blocks (K base edges,
  Z lifted lanes, B batch).  See :mod:`ldpc_tpu.codes.edge_layout` for the
  alignment conventions.
* Per-variable sums ride the MXU as an incidence matmul (C, K) @ (K, Z*B).
* The check<->variable regrouping (a sparse gather in generic formulations)
  is a precomputed static-index gather that *composes* the row grouping with
  the circulant roll — one gather per direction per iteration, which is the
  HBM-bandwidth floor for this op.
* Leave-one-out is computed by total-reduce + exclusion (sum: subtract own;
  min: min/second-min select), O(E) instead of the reference's O(sum d^2)
  neighbor tables.

Everything is shape-static and differentiable (the min-sum check update has
the usual straight-through-style subgradients via jnp.where), so the same
ops back both classical and neural decoders.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.codes.edge_layout import QCLayout

Array = jax.Array

# Stand-in for +inf.  Deliberately moderate: XLA's fusion may reassociate
# `where`-masked products in the backward pass, so sentinel values must stay
# far from the float32 overflow boundary even when multiplied together
# (1e30 * 1e30 -> inf -> 0*inf = NaN under fused gradients; 1e9^2 = 1e18 is
# safe).  Real message magnitudes are bounded by ~1e4.
_BIG = 1e9


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "edge_col",
        "edge_type",
        "row_gather_var",
        "ungroup_to_var",
        "row_valid",
        "col_incidence",
        "edge_check_var_aligned",
        "row_incidence",
        "edge_row",
        "roll_to_check",
        "roll_to_var",
    ],
    meta_fields=["Z", "R", "C", "K", "dr_max", "num_edge_types"],
)
@dataclasses.dataclass(frozen=True)
class QCPlan:
    """Device-resident compile-time constants derived from a :class:`QCLayout`.

    A pytree whose index arrays are leaves and whose dimensions are static
    metadata, so a plan can be passed straight through `jax.jit` boundaries.
    """

    Z: int
    R: int
    C: int
    K: int
    dr_max: int
    num_edge_types: int
    edge_col: Array  # (K,)
    edge_type: Array  # (K,)
    row_gather_var: Array  # (R*dr_max*Z,) flat
    ungroup_to_var: Array  # (K*Z,) flat
    row_valid: Array  # (R, dr_max) bool
    col_incidence: Array  # (C, K) f32
    edge_check_var_aligned: Array  # (K*Z,) flat idx into (R*Z): my check node
    row_incidence: Array  # (R, K) f32
    edge_row: Array  # (K,)
    roll_to_check: Array  # (K, Z): var-aligned -> check-aligned lane index
    roll_to_var: Array  # (K, Z): check-aligned -> var-aligned lane index


def make_plan(qc: QCLayout) -> QCPlan:
    # Check index of the var-aligned edge (k, z_c): (edge_row, (z_c - s) % Z).
    Z = qc.Z
    zc = np.arange(Z)[None, :]
    chk = qc.edge_row[:, None] * Z + (zc - qc.edge_shift[:, None]) % Z
    row_inc = np.zeros((qc.num_base_rows, qc.num_base_edges), dtype=np.float32)
    row_inc[qc.edge_row, np.arange(qc.num_base_edges)] = 1.0
    roll_to_check = ((zc + qc.edge_shift[:, None]) % Z).astype(np.int32)  # (K, Z)
    roll_to_var = ((zc - qc.edge_shift[:, None]) % Z).astype(np.int32)
    return QCPlan(
        Z=Z,
        R=qc.num_base_rows,
        C=qc.num_base_cols,
        K=qc.num_base_edges,
        dr_max=qc.dr_max,
        edge_col=jnp.asarray(qc.edge_col),
        edge_type=jnp.asarray(qc.edge_type),
        num_edge_types=qc.num_edge_types,
        row_gather_var=jnp.asarray(qc.row_gather_var.reshape(-1)),
        ungroup_to_var=jnp.asarray(qc.ungroup_to_var.reshape(-1)),
        row_valid=jnp.asarray(qc.row_edges != qc.num_base_edges),
        col_incidence=jnp.asarray(qc.col_incidence),
        edge_check_var_aligned=jnp.asarray(chk.reshape(-1).astype(np.int32)),
        row_incidence=jnp.asarray(row_inc),
        edge_row=jnp.asarray(qc.edge_row),
        roll_to_check=jnp.asarray(roll_to_check),
        roll_to_var=jnp.asarray(roll_to_var),
    )


def plan_from_H(H) -> QCPlan:
    """Decode plan for an arbitrary dense binary parity-check matrix.

    One-call capability parity with the reference decoders' ``__init__(H)``
    (`traditional_decoders.py:17-40`, `message_gnn_decoder.py:363`): wraps H
    as a Z=1 base graph (each 1 = a size-1 circulant) and builds the normal
    QC plan, so every decoder in the framework accepts a non-QC code.
    """
    from ldpc_tpu.codes.base_graphs import base_graph_from_H
    from ldpc_tpu.codes.edge_layout import qc_layout

    return make_plan(qc_layout(base_graph_from_H(H), 1))


# ---------------------------------------------------------------------------
# Layout helpers
# ---------------------------------------------------------------------------


def llr_to_cz(llr: Array, plan: QCPlan) -> Array:
    """(B, n) channel LLRs -> (C, Z, B) grid."""
    B = llr.shape[0]
    return llr.reshape(B, plan.C, plan.Z).transpose(1, 2, 0)


def cz_to_llr(grid: Array) -> Array:
    """(C, Z, B) -> (B, n)."""
    C, Z, B = grid.shape
    return grid.transpose(2, 0, 1).reshape(B, C * Z)


def col_sum(msgs_var: Array, plan: QCPlan) -> Array:
    """Sum messages per variable: (K, Z, B) -> (C, Z, B).  MXU matmul."""
    K, Z, B = msgs_var.shape
    flat = msgs_var.reshape(K, Z * B)
    return jnp.matmul(plan.col_incidence, flat, preferred_element_type=jnp.float32).reshape(
        plan.C, Z, B
    )


def group_to_check(msgs_var: Array, plan: QCPlan, pad_value: float = 0.0) -> Array:
    """Var-aligned (K, Z, B) -> check-grouped (R, dr_max, Z, B).

    Composes the row grouping and circulant roll in one static gather.
    """
    K, Z, B = msgs_var.shape
    padded = jnp.concatenate(
        [msgs_var.reshape(K * Z, B), jnp.full((1, B), pad_value, msgs_var.dtype)], axis=0
    )
    return padded[plan.row_gather_var].reshape(plan.R, plan.dr_max, Z, B)


def ungroup_to_var(grouped: Array, plan: QCPlan) -> Array:
    """Check-grouped (R, dr_max, Z, B) -> var-aligned (K, Z, B)."""
    R, D, Z, B = grouped.shape
    return grouped.reshape(R * D * Z, B)[plan.ungroup_to_var].reshape(plan.K, Z, B)


# ---------------------------------------------------------------------------
# Variable-node update
# ---------------------------------------------------------------------------


def var_update(c2v_var: Array, llr_cz: Array, plan: QCPlan):
    """Leave-one-out variable update.

    Returns ``(v2c_var, beliefs)`` where ``beliefs = llr + sum_in`` (the
    a-posteriori LLRs, reference `traditional_decoders.py:96-101`) and
    ``v2c[e] = beliefs[var(e)] - c2v[e]`` (total-sum minus own message,
    replacing the reference's per-edge neighbor-table sum,
    `models/layers.py:100-123`).
    """
    beliefs = llr_cz + col_sum(c2v_var, plan)
    v2c = beliefs[plan.edge_col] - c2v_var
    return v2c, beliefs


# ---------------------------------------------------------------------------
# Check-node updates
# ---------------------------------------------------------------------------


def _signs_and_mags(grouped: Array, valid: Array):
    """Masked signs (pad -> +1; sign(0) = +1 as in `models/layers.py:52`) and
    magnitudes (pad -> big)."""
    sign = jnp.where(grouped < 0, -1.0, 1.0)
    sign = jnp.where(valid, sign, 1.0)
    mag = jnp.where(valid, jnp.abs(grouped), _BIG)
    return sign, mag


def check_update_minsum(v2c_var: Array, plan: QCPlan, alpha=1.0, offset=0.0) -> Array:
    """Scaled / offset min-sum check update, leave-one-out via min / 2nd-min.

    Equivalent to the reference's per-edge min/2nd-min tracking
    (`traditional_decoders.py:207-232`) but O(d) per check via a single
    min+argmin pass: for the arg-min edge the excluded minimum is the second
    minimum, for every other edge it is the minimum.

    ``offset``: offset-min-sum correction |c2v| = max(min - offset, 0)
    (Fossorier's OMS; the learnable-offset form of Lugosch & Gross, "Neural
    Offset Min-Sum Decoding", arXiv:1701.05931).  alpha and offset compose:
    c2v = alpha * sign * max(min_loo - offset, 0).
    """
    grouped = group_to_check(v2c_var, plan)  # (R, D, Z, B)
    valid = plan.row_valid[:, :, None, None]
    sign, mag = _signs_and_mags(grouped, valid)

    total_sign = jnp.prod(sign, axis=1, keepdims=True)
    # min / 2nd-min without argmin: sort-free running reduction is not
    # expressible as a lax reduce, but top-2 via one extra masked min is.
    m1 = jnp.min(mag, axis=1, keepdims=True)
    is_min = mag == m1
    # knock out ONE occurrence of the minimum (the first) before re-minning
    first_min = jnp.cumsum(is_min.astype(jnp.int32), axis=1) * is_min == 1
    m2 = jnp.min(jnp.where(first_min, _BIG, mag), axis=1, keepdims=True)

    loo_sign = total_sign * sign  # sign in {-1, +1}: multiply == divide
    # excluded-minimum select: the (first) minimum edge sees m2, others m1
    loo_mag = jnp.where(first_min, m2, m1)
    # Mask BEFORE the multiply: no sentinel-scale value may enter a product,
    # or fused backward passes can manufacture inf*0 = NaN.
    loo_mag = jnp.where(valid & (loo_mag < _BIG), loo_mag, 0.0)
    loo_mag = jnp.maximum(loo_mag - offset, 0.0)
    c2v = alpha * loo_sign * loo_mag
    return ungroup_to_var(c2v, plan)


def check_update_sumproduct(v2c_var: Array, plan: QCPlan, clip: float = 20.0) -> Array:
    """Sum-product (belief propagation) check update.

    Numerically-stable phi-domain form of the reference's tanh/atanh product
    (`traditional_decoders.py:70-81`): with phi(x) = -log(tanh(x/2))
    (self-inverse), |c2v_i| = phi(sum_j phi(|v2c_j|) - phi(|v2c_i|)) and the
    sign is the leave-one-out sign product.  ``clip`` bounds magnitudes for
    stability (phi explodes at 0).
    """
    grouped = group_to_check(v2c_var, plan)
    valid = plan.row_valid[:, :, None, None]
    sign, mag = _signs_and_mags(grouped, valid)
    mag = jnp.clip(mag, 1e-7, clip)

    def phi(x):
        # -log(tanh(x/2)) = log((e^x + 1) / (e^x - 1)), computed stably
        return -jnp.log(jnp.tanh(x / 2.0) + 1e-30)

    phis = jnp.where(valid, phi(mag), 0.0)
    total_phi = jnp.sum(phis, axis=1, keepdims=True)
    total_sign = jnp.prod(sign, axis=1, keepdims=True)
    loo = jnp.maximum(total_phi - phis, 1e-7)
    c2v = total_sign * sign * phi(loo)
    c2v = jnp.where(valid, c2v, 0.0)
    return ungroup_to_var(c2v, plan)


# ---------------------------------------------------------------------------
# Syndrome
# ---------------------------------------------------------------------------


def syndrome_ok(bits_cz: Array, plan: QCPlan) -> Array:
    """Per-frame parity validity: (C, Z, B) hard bits -> (B,) bool.

    Fixed-shape replacement for the reference's per-batch Python XOR loop
    (`traditional_decoders.py:111-134`); identical statistics, no dynamic
    shapes (SURVEY.md §7 hard part 3).
    """
    bits_edge = bits_cz[plan.edge_col]  # (K, Z, B) var-aligned
    grouped = group_to_check(bits_edge, plan, pad_value=0.0)
    parity = jnp.sum(grouped, axis=1) % 2.0  # (R, Z, B)
    return jnp.all(parity == 0.0, axis=(0, 1))


# ---------------------------------------------------------------------------
# Feature-space group aggregations (message-GNN support)
# ---------------------------------------------------------------------------
#
# The reference message-GNN aggregates over dense E x E normalized adjacency
# matrices D^(-1/2)(A+I)D^(-1/2) (`message_gnn_decoder.py:410-469`).  Because
# the same-variable (resp. same-check) graph is a disjoint union of cliques
# and every message in the clique of variable v has identical degree d_v,
# that normalized aggregation is *exactly the within-group mean* — see
# tests/test_message_gnn.py::TestAdjacencyEquivalence for the numerical
# proof.  Group means are O(E*H) segment ops here instead of O(E^2*H) dense
# bmm (40M-entry adjacency at E=6304, SURVEY.md §7 hard part 6).


def var_group_mean(feats: Array, plan: QCPlan) -> Array:
    """Mean over messages sharing my variable: (K, Z, B, H) -> (K, Z, B, H).

    Computes in the input dtype (bf16 traffic, f32 accumulation on the MXU).
    """
    K, Z, B, H = feats.shape
    inc = plan.col_incidence.astype(feats.dtype)
    sums = jnp.matmul(
        inc, feats.reshape(K, Z * B * H), preferred_element_type=jnp.float32
    ).reshape(plan.C, Z, B, H)
    counts = plan.col_incidence.sum(axis=1)[:, None, None, None]
    mean = (sums / jnp.maximum(counts, 1.0)).astype(feats.dtype)
    return mean[plan.edge_col]


def check_group_mean(feats: Array, plan: QCPlan) -> Array:
    """Mean over messages sharing my check: (K, Z, B, H) -> (K, Z, B, H).

    Roll-to-check-alignment + incidence matmul + distribute + roll back:
    unlike a padded (R, dr_max, ...) gather this never materializes the
    2.1x-padded expansion, and the K-reduction rides the MXU.  Computes in
    the input dtype; sums accumulate in f32.
    """
    K, Z, B, H = feats.shape
    rolled = jnp.take_along_axis(feats, plan.roll_to_check[:, :, None, None], axis=1)
    inc = plan.row_incidence.astype(feats.dtype)
    rowsum = jnp.matmul(
        inc, rolled.reshape(K, Z * B * H), preferred_element_type=jnp.float32
    ).reshape(plan.R, Z, B, H)
    counts = plan.row_incidence.sum(axis=1)[:, None, None, None]
    rowmean = (rowsum / jnp.maximum(counts, 1.0)).astype(feats.dtype)
    per_edge_chk = rowmean[plan.edge_row]  # (K, Z, B, H) check-aligned
    return jnp.take_along_axis(per_edge_chk, plan.roll_to_var[:, :, None, None], axis=1)


# ---------------------------------------------------------------------------
# Per-edge parameter plumbing
# ---------------------------------------------------------------------------


def flat_to_qc_var(flat_params: Array, qc: QCLayout) -> np.ndarray | Array:
    """Reference-ordered flat per-edge vector (E,) -> var-aligned (K, Z)."""
    return flat_params[qc.flat_edge_id_var_aligned()]
