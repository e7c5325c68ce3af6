"""Fused Pallas TPU inference kernel for the message-centered GNN decoder.

Serving path for :class:`~ldpc_tpu.models.message_gnn.MessageGNNDecoder`
(fully-neural mode): the whole iterative forward — type-typed message
features, within-group means over both relations, the two 2-layer MLPs,
residual skips, output projection and per-variable aggregation — runs in
one kernel with every feature block VMEM-resident.  The XLA path
round-trips the (K, Z, B, h) feature tensor through HBM ~6 times per
iteration (embedding add, two group means, two MLP stacks, residual); here
HBM traffic collapses to one LLR read and one soft-bit write per tile.

Layout (per batch tile):

* lanes carry ``Z * Bt`` positions, z-major (``lane = z * Bt + b``), so the
  circulant check<->variable alignment for shift s is a lane rotation by
  ``s * Bt`` — the same trick as :mod:`ldpc_tpu.ops.pallas_minsum`, lifted
  to h-row feature blocks.  When Z does not divide 128, the tile holds one
  frame (``Bt = 1``) with Z padded to a lane multiple and static
  concat-rolls.
* sublanes carry the hidden dimension: message k's features are the
  ``(h, Z * Bt)`` block at rows ``k * h``.
* the per-layer *type embeddings are folded away*: they enter the MLPs only
  additively through the first Dense layer (both directly and through the
  group means, which are linear), so their entire contribution is a
  precomputed per-(iteration, edge) bias column — the kernel never
  materializes ``feats + type_emb``.

Weight layout: per-iteration stacks sliced with ``pl.ds(t * h, h)`` inside a
``fori_loop`` (an unrolled iteration loop at K=197 edges would blow the
Mosaic stack allocator; cf. pallas_neural.py).

Reference parity target: `message_gnn_decoder.py:155-353` (intended
semantics); numerical agreement with the XLA module is asserted in
tests/test_pallas_gnn.py.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.codes.edge_layout import QCLayout
from ldpc_tpu.ops.pallas_minsum import (
    _VMEM_BUDGET,
    _roll_lanes,
    _run_iterations,
    _structure,
)

Array = jax.Array

# The unrolled per-message MLP loop needs more scoped (stack) VMEM than the
# 16 MiB default at h=64 — v5e has 128 MiB per core, so grant the kernel a
# generous slice for spilled vector temporaries.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _extract(params, qc: QCLayout, num_iterations: int, hidden_dim: int,
             share_layers: bool, input_injection: bool):
    """Flax param tree -> packed numpy weight arrays for the kernel."""
    p = params["params"] if "params" in params else params
    h = hidden_dim
    T = num_iterations
    K = qc.num_base_edges
    h_in = 3 * h if input_injection else 2 * h

    emb_w = np.asarray(p["input_embedding"]["kernel"], np.float32).reshape(h)
    emb_b = np.asarray(p["input_embedding"]["bias"], np.float32).reshape(h)
    proj_w = np.asarray(p["output_projection"]["kernel"], np.float32).reshape(h)
    proj_b = float(np.asarray(p["output_projection"]["bias"]).reshape(()))

    # Per-relation group-mean weights for the type-embedding fold.
    col_members = [[] for _ in range(qc.num_base_cols)]
    row_members = [[] for _ in range(qc.num_base_rows)]
    for k in range(K):
        col_members[qc.edge_col[k]].append(k)
        row_members[qc.edge_row[k]].append(k)

    W1v = np.zeros((T, h, h_in), np.float32)  # transposed for (h,h_in)@(h_in,L)
    W2v = np.zeros((T, h, h), np.float32)
    W1c = np.zeros((T, h, h_in), np.float32)
    W2c = np.zeros((T, h, h), np.float32)
    b2v = np.zeros((T, h), np.float32)
    b2c = np.zeros((T, h), np.float32)
    bias1v = np.zeros((T, h, K), np.float32)  # b1 + type-embedding fold
    bias1c = np.zeros((T, h, K), np.float32)

    for t in range(T):
        name = "gnn_layer" if share_layers else f"gnn_layer_{t}"
        lp = p[name]
        te = np.asarray(lp["message_type_embeddings"], np.float32)  # (n_types, h)
        te_edge = te[np.asarray(qc.edge_type)]  # (K, h)
        te_var = np.stack([  # mean over my variable's clique
            te_edge[col_members[qc.edge_col[k]]].mean(axis=0) for k in range(K)
        ])
        te_chk = np.stack([  # mean over my check's clique (roll-invariant)
            te_edge[row_members[qc.edge_row[k]]].mean(axis=0) for k in range(K)
        ])
        for prefix, W1, W2, b2, bias1, te_agg in (
            ("var_to_check_update", W1v, W2v, b2v, bias1v, te_var),
            ("check_to_var_update", W1c, W2c, b2c, bias1c, te_chk),
        ):
            k1 = np.asarray(lp[prefix]["Dense_0"]["kernel"], np.float32)  # (h_in, h)
            bb1 = np.asarray(lp[prefix]["Dense_0"]["bias"], np.float32)
            k2 = np.asarray(lp[prefix]["Dense_1"]["kernel"], np.float32)  # (h, h)
            bb2 = np.asarray(lp[prefix]["Dense_1"]["bias"], np.float32)
            W1[t] = k1.T
            W2[t] = k2.T
            b2[t] = bb2
            te_cat = np.zeros((K, h_in), np.float32)
            te_cat[:, :h] = te_edge
            te_cat[:, h : 2 * h] = te_agg
            # llr block (if any) contributes no type embedding
            bias1[t] = (te_cat @ k1 + bb1).T  # (h, K)

    return dict(
        emb_w=emb_w, emb_b=emb_b, proj_w=proj_w, proj_b=proj_b,
        W1v=W1v, W2v=W2v, W1c=W1c, W2c=W2c, b2v=b2v, b2c=b2c,
        bias1v=bias1v, bias1c=bias1c, h_in=h_in,
    )


def gnn_vmem_bytes(qc: QCLayout, hidden_dim: int, lanes: int,
                   input_injection: bool) -> int:
    K, C, R = qc.num_base_edges, qc.num_base_cols, qc.num_base_rows
    h = hidden_dim
    bf16_blocks = K + (C if input_injection else 0) + C + R  # feats/llr/means
    f32_blocks = (2 * C if input_injection else C) + R  # pre_col + pre_row
    return (bf16_blocks * 2 + f32_blocks * 4) * h * lanes + 2 * C * lanes * 4


def _kernel(llr_ref, w1v_ref, w2v_ref, w1c_ref, w2c_ref, b1v_ref, b1c_ref,
            b2v_ref, b2c_ref, emb_ref, soft_ref,
            feats, llr_feats, var_mean, row_mean, pre_col, pre_row, *,
            st, h: int, T: int, Bt: int, lanes: int, inject: bool,
            residual_from: int = 1):
    Z, K, C, R = st.Z, st.K, st.C, st.R
    packed = Bt > 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def roll(x, s):
        # Mosaic's dynamic_rotate only supports 32-bit data: bf16 feature
        # blocks take a f32 round-trip around the lane rotation.
        if packed:
            s = (s % Z) * Bt
            if s == 0:
                return x
            if x.dtype == jnp.bfloat16:
                return pltpu.roll(x.astype(jnp.float32), s, 1).astype(jnp.bfloat16)
            return pltpu.roll(x, s, 1)
        if x.dtype == jnp.bfloat16:
            return _roll_lanes(x.astype(jnp.float32), s, Z).astype(jnp.bfloat16)
        return _roll_lanes(x, s, Z)

    def fb(k):  # feature block rows for message k
        return pl.ds(k * h, h)

    # ---- seed: feats0 = emb_w * llr[col] + emb_b --------------------------
    emb_w = emb_ref[0:h, 0:1]  # (h, 1)
    emb_b = emb_ref[h : 2 * h, 0:1]
    for c in range(C):
        row = llr_ref[c : c + 1, :]  # (1, lanes) f32
        f0 = (jnp.broadcast_to(row, (h, lanes)) * emb_w + emb_b).astype(bf16)
        if inject:
            llr_feats[fb(c), :] = f0  # per-COLUMN: all edges of c share it
        for k in st.col_members[c]:
            feats[fb(k), :] = f0

    inv_dc = [1.0 / max(len(st.col_members[c]), 1) for c in range(C)]
    inv_dr = [1.0 / max(len(st.row_members[r]), 1) for r in range(R)]

    def iteration(t, _):
        th = pl.ds(t * h, h)
        # ---- group means over both relations (pure data; the type-
        # embedding part of the mean is folded into bias1) ------------------
        for c in range(C):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + feats[fb(k), :].astype(f32)
            var_mean[fb(c), :] = (acc * inv_dc[c]).astype(bf16)
        for r in range(R):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.row_members[r]:
                acc = acc + roll(feats[fb(k), :], -st.shifts[k]).astype(f32)
            row_mean[fb(r), :] = (acc * inv_dr[r]).astype(bf16)

        w1v_f = w1v_ref[th, 0:h]  # first-layer weight blocks (h, h) bf16
        w1v_a = w1v_ref[th, h : 2 * h]
        w1c_f = w1c_ref[th, 0:h]
        w1c_a = w1c_ref[th, h : 2 * h]
        w2v = w2v_ref[th, 0:h]
        w2c = w2c_ref[th, 0:h]
        b2v = b2v_ref[th, 0:1]  # (h, 1) f32
        b2c = b2c_ref[th, 0:1]
        res_gate = jnp.where(t >= residual_from, 1.0, 0.0).astype(f32)

        # ---- shared first-layer contractions ------------------------------
        # agg_v and the LLR block are identical for every edge of a column;
        # agg_c is a per-row quantity whose lane roll commutes with the
        # contraction (roll(W @ x) == W @ roll(x): lanes never mix), so the
        # (h, 3h) @ (3h, lanes) per-edge matmul of the naive layout factors
        # into per-column/per-row precomputes + one (h, h) per-edge dot.
        for c in range(C):
            pc = jnp.dot(w1v_a, var_mean[fb(c), :], preferred_element_type=f32)
            if inject:
                lf = llr_feats[fb(c), :]
                pc = pc + jnp.dot(w1v_ref[th, 2 * h : 3 * h], lf,
                                  preferred_element_type=f32)
                pre_col[fb(C + c), :] = jnp.dot(w1c_ref[th, 2 * h : 3 * h], lf,
                                                preferred_element_type=f32)
            pre_col[fb(c), :] = pc
        for r in range(R):
            pre_row[fb(r), :] = jnp.dot(w1c_a, row_mean[fb(r), :],
                                        preferred_element_type=f32)

        # ---- per-message MLP updates --------------------------------------
        for k in range(K):
            f_k = feats[fb(k), :]
            c_k, r_k = st.cols[k], st.rows[k]
            pre_v = (jnp.dot(w1v_f, f_k, preferred_element_type=f32)
                     + pre_col[fb(c_k), :] + b1v_ref[th, k : k + 1])
            pre_c = (jnp.dot(w1c_f, f_k, preferred_element_type=f32)
                     + roll(pre_row[fb(r_k), :], st.shifts[k])
                     + b1c_ref[th, k : k + 1])
            if inject:
                pre_c = pre_c + pre_col[fb(C + c_k), :]
            h1_v = jnp.maximum(pre_v, 0.0).astype(bf16)
            out_v = jnp.dot(w2v, h1_v, preferred_element_type=f32) + b2v
            h1_c = jnp.maximum(pre_c, 0.0).astype(bf16)
            out_c = jnp.dot(w2c, h1_c, preferred_element_type=f32) + b2c
            new = out_v.astype(bf16) + out_c.astype(bf16)
            feats[fb(k), :] = new + res_gate.astype(bf16) * f_k
        return 0

    jax.lax.fori_loop(0, T, iteration, 0, unroll=False)

    # ---- output: proj, per-variable sum, sigmoid --------------------------
    proj_w = emb_ref[2 * h : 3 * h, 0:1]  # (h, 1) f32
    proj_b = emb_ref[3 * h : 3 * h + 1, 0:1]  # (1, 1)
    for c in range(C):
        acc = jnp.zeros((1, lanes), f32)
        for k in st.col_members[c]:
            contrib = jnp.sum(feats[fb(k), :].astype(f32) * proj_w, axis=0, keepdims=True)
            acc = acc + contrib + proj_b
        combined = llr_ref[c : c + 1, :] + acc
        soft_ref[c : c + 1, :] = 1.0 / (1.0 + jnp.exp(combined))


class _GNNStructure:
    """Static structure + per-relation member lists for the kernel trace."""

    def __init__(self, qc: QCLayout):
        base = _structure(qc)
        self.Z, self.R, self.C, self.K = base.Z, base.R, base.C, base.K
        self.row_members = base.row_members
        self.col_members = base.col_members
        self.shifts = base.shifts
        self.cols = base.cols
        self.rows = tuple(int(r) for r in qc.edge_row)


# ---------------------------------------------------------------------------
# v2 kernel: edge-batched matmuls (full-width MXU)
# ---------------------------------------------------------------------------
#
# The v1 kernel issues 4 small (h, h) @ (h, lanes) matmuls per base edge per
# iteration.  At h=64 both the output-row and contraction dims underfill the
# 128x128 MXU: the fill-factor ceiling is (h/128)^2 = 25% of peak, and v1
# measures right at that ceiling (docs/PERFORMANCE.md).  v2 restructures the
# data layout from sublane-blocked (K*h, lanes) to lane-blocked (h, K*lanes)
# so the per-edge matmuls batch across edges:
#
# * first layer: one (2h, h) @ (h, G*lanes) matmul per edge group — the
#   var- and check-side weights stack along M (2h = 128 rows full at h=64);
# * second layer: one (h, 2h) @ (2h, G*lanes) matmul — [W2v W2c] @ [h1v;
#   h1c] has a full 128-deep contraction AND produces out_v + out_c for
#   free (the decoder sums them anyway);
# * the per-column LLR precompute stacks both sides the same way.
#
# Same flop count as v1 (the column/row mean factorization is kept), ~2.5x
# less MXU time by fill factor, and ~50x fewer matmul instructions.  Edge
# groups of `mm_group` keep live matmul operands ~1 MiB so nothing large
# ever spills: each edge's first-layer input is its own feats block, and
# cross-edge dependencies only flow through the means (computed into
# scratch at iteration start), so groups can be processed and overwritten
# in place sequentially.


def _kernel_v2(llr_ref, w1f_ref, w1va_ref, w1ca_ref, w1l_ref, w2vc_ref,
               b1v_ref, b1c_ref, b2_ref, emb_ref, soft_ref,
               feats, llr_feats, var_mean, row_mean, pre_col, pre_row, pre_llr,
               *, st, h: int, T: int, Bt: int, lanes: int, inject: bool,
               mm_group: int = 16, residual_from: int = 1):
    Z, K, C, R = st.Z, st.K, st.C, st.R
    packed = Bt > 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def roll(x, s):
        if packed:
            s = (s % Z) * Bt
            if s == 0:
                return x
            if x.dtype == jnp.bfloat16:
                return pltpu.roll(x.astype(jnp.float32), s, 1).astype(jnp.bfloat16)
            return pltpu.roll(x, s, 1)
        if x.dtype == jnp.bfloat16:
            return _roll_lanes(x.astype(jnp.float32), s, Z).astype(jnp.bfloat16)
        return _roll_lanes(x, s, Z)

    def lb(k):  # lane block for edge/column/row index k
        return pl.ds(k * lanes, lanes)

    groups = [list(range(g, min(g + mm_group, K))) for g in range(0, K, mm_group)]

    # ---- seed: feats0 = emb_w * llr[col] + emb_b --------------------------
    emb_w = emb_ref[0:h, 0:1]
    emb_b = emb_ref[h : 2 * h, 0:1]
    for c in range(C):
        row = llr_ref[c : c + 1, :]
        f0 = (jnp.broadcast_to(row, (h, lanes)) * emb_w + emb_b).astype(bf16)
        if inject:
            llr_feats[:, lb(c)] = f0
        for k in st.col_members[c]:
            feats[:, lb(k)] = f0

    inv_dc = [1.0 / max(len(st.col_members[c]), 1) for c in range(C)]
    inv_dr = [1.0 / max(len(st.row_members[r]), 1) for r in range(R)]

    def iteration(t, _):
        th = pl.ds(t * h, h)
        t2h = pl.ds(t * 2 * h, 2 * h)
        # ---- group means (identical math to v1, lane-blocked) -------------
        for c in range(C):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + feats[:, lb(k)].astype(f32)
            var_mean[:, lb(c)] = (acc * inv_dc[c]).astype(bf16)
        for r in range(R):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.row_members[r]:
                acc = acc + roll(feats[:, lb(k)], -st.shifts[k]).astype(f32)
            row_mean[:, lb(r)] = (acc * inv_dr[r]).astype(bf16)

        # ---- batched per-relation precomputes ------------------------------
        pre_col[:, :] = jnp.dot(w1va_ref[th, 0:h], var_mean[:, :],
                                preferred_element_type=f32)
        pre_row[:, :] = jnp.dot(w1ca_ref[th, 0:h], row_mean[:, :],
                                preferred_element_type=f32)
        if inject:
            pre_llr[:, :] = jnp.dot(w1l_ref[t2h, 0:h], llr_feats[:, :],
                                    preferred_element_type=f32)

        w1f = w1f_ref[t2h, 0:h]  # (2h, h): [w1v_f; w1c_f]
        w2vc = w2vc_ref[th, 0 : 2 * h]  # (h, 2h): [W2v W2c]
        b2 = b2_ref[th, 0:1]
        res_gate = jnp.where(t >= residual_from, 1.0, 0.0).astype(bf16)

        for grp in groups:
            g0, gn = grp[0], len(grp)
            f_g = feats[:, pl.ds(g0 * lanes, gn * lanes)]  # (h, gn*lanes) bf16
            p_g = jnp.dot(w1f, f_g, preferred_element_type=f32)  # (2h, gn*lanes)
            h1_parts_v, h1_parts_c = [], []
            for j, k in enumerate(grp):
                c_k, r_k = st.cols[k], st.rows[k]
                jl = slice(j * lanes, (j + 1) * lanes)
                pv = (p_g[0:h, jl] + pre_col[:, lb(c_k)]
                      + b1v_ref[th, k : k + 1])
                pc = (p_g[h : 2 * h, jl]
                      + roll(pre_row[:, lb(r_k)], st.shifts[k])
                      + b1c_ref[th, k : k + 1])
                if inject:
                    pv = pv + pre_llr[0:h, lb(c_k)]
                    pc = pc + pre_llr[h : 2 * h, lb(c_k)]
                h1_parts_v.append(jnp.maximum(pv, 0.0).astype(bf16))
                h1_parts_c.append(jnp.maximum(pc, 0.0).astype(bf16))
            h1_g = jnp.concatenate(
                [jnp.concatenate(h1_parts_v, axis=1),
                 jnp.concatenate(h1_parts_c, axis=1)], axis=0
            )  # (2h, gn*lanes)
            out_g = jnp.dot(w2vc, h1_g, preferred_element_type=f32) + b2
            feats[:, pl.ds(g0 * lanes, gn * lanes)] = (
                out_g.astype(bf16) + res_gate * f_g
            )
        return 0

    jax.lax.fori_loop(0, T, iteration, 0, unroll=False)

    # ---- output: proj, per-variable sum, sigmoid --------------------------
    proj_w = emb_ref[2 * h : 3 * h, 0:1]
    proj_b = emb_ref[3 * h : 3 * h + 1, 0:1]
    for c in range(C):
        acc = jnp.zeros((1, lanes), f32)
        for k in st.col_members[c]:
            contrib = jnp.sum(feats[:, lb(k)].astype(f32) * proj_w, axis=0,
                              keepdims=True)
            acc = acc + contrib + proj_b
        combined = llr_ref[c : c + 1, :] + acc
        soft_ref[c : c + 1, :] = 1.0 / (1.0 + jnp.exp(combined))


def gnn_v2_vmem_bytes(qc: QCLayout, hidden_dim: int, lanes: int,
                      input_injection: bool) -> int:
    K, C, R = qc.num_base_edges, qc.num_base_cols, qc.num_base_rows
    h = hidden_dim
    bf16 = (K + (C if input_injection else 0) + C + R) * h * lanes * 2
    f32 = (C + R + (2 * C if input_injection else 0)) * h * lanes * 4
    return bf16 + f32 + 2 * C * lanes * 4


def make_fused_gnn_decoder_v2(
    qc: QCLayout,
    params,
    num_iterations: int = 5,
    hidden_dim: int = 64,
    share_layers: bool = False,
    input_injection: bool = False,
    mm_group: int = 16,
    interpret: bool = False,
):
    """Edge-batched-matmul variant of :func:`make_fused_gnn_decoder`.

    Numerically equivalent serving path (same extractor, same math, bf16
    rounding aside); see the layout comment above `_kernel_v2`.
    """
    st = _GNNStructure(qc)
    Z, C, K, h = st.Z, st.C, st.K, hidden_dim
    n = C * Z
    T = num_iterations
    if h % 8:
        raise ValueError(f"hidden_dim must be a multiple of 8, got {h}")
    if 128 % Z == 0:
        Bt, lanes = 128 // Z, 128
    elif Z % 8 == 0:
        Bt, lanes = 1, -(-Z // 128) * 128
    else:
        raise ValueError(f"fused GNN kernel requires Z % 8 == 0 or Z | 128, got Z={Z}")
    need = gnn_v2_vmem_bytes(qc, h, lanes, input_injection)
    budget = 48 * 2**20  # scratch only; weights/temporaries live beside it
    if need > budget:
        raise ValueError(
            f"v2 GNN state ({need / 2**20:.1f} MiB) exceeds the "
            f"{budget / 2**20:.0f} MiB scratch budget (Z={Z}, h={h})"
        )

    w = _extract(params, qc, T, h, share_layers, input_injection)
    Kpad = -(-K // 128) * 128

    def stack2(a, b):  # (T, h, h) x2 -> (T*2h, h): [a_t; b_t] per iteration
        T_, hh, d = a.shape
        out = np.zeros((T_ * 2 * hh, max(d, 128)), np.float32)
        for t in range(T_):
            out[t * 2 * hh : t * 2 * hh + hh, :d] = a[t]
            out[t * 2 * hh + hh : (t + 1) * 2 * hh, :d] = b[t]
        return out

    # first-layer blocks: [:, :h] on own feats, [:, h:2h] on the relation
    # mean, [:, 2h:3h] on the (static) LLR features
    w1f = jnp.asarray(stack2(w["W1v"][:, :, 0:h], w["W1c"][:, :, 0:h]), jnp.bfloat16)
    w1l = jnp.asarray(
        stack2(w["W1v"][:, :, 2 * h : 3 * h], w["W1c"][:, :, 2 * h : 3 * h])
        if input_injection else np.zeros((T * 2 * h, 128), np.float32),
        jnp.bfloat16,
    )

    def stack1(x, pad_to):  # (T, h, d) -> (T*h, pad_to)
        T_, hh, d = x.shape
        out = np.zeros((T_ * hh, pad_to), x.dtype)
        out[:, :d] = x.reshape(T_ * hh, d)
        return out

    w1va = jnp.asarray(stack1(w["W1v"][:, :, h : 2 * h], 128), jnp.bfloat16)
    w1ca = jnp.asarray(stack1(w["W1c"][:, :, h : 2 * h], 128), jnp.bfloat16)
    w2vc = jnp.asarray(
        stack1(np.concatenate([w["W2v"], w["W2c"]], axis=2), max(2 * h, 128)),
        jnp.bfloat16,
    )
    b1v = jnp.asarray(stack1(w["bias1v"], Kpad), jnp.float32)
    b1c = jnp.asarray(stack1(w["bias1c"], Kpad), jnp.float32)
    b2 = jnp.asarray(
        np.repeat((w["b2v"] + w["b2c"]).reshape(T * h, 1), 128, 1), jnp.float32
    )
    emb = np.zeros((3 * h + 8, 128), np.float32)
    emb[0:h, :] = w["emb_w"][:, None]
    emb[h : 2 * h, :] = w["emb_b"][:, None]
    emb[2 * h : 3 * h, :] = w["proj_w"][:, None]
    emb[3 * h, :] = w["proj_b"]
    emb = jnp.asarray(emb)

    kernel = functools.partial(
        _kernel_v2, st=st, h=h, T=T, Bt=Bt, lanes=lanes, inject=input_injection,
        mm_group=mm_group,
    )
    vm = pltpu.VMEM
    weights = (w1f, w1va, w1ca, w1l, w2vc, b1v, b1c, b2, emb)
    wspecs = [
        pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=vm) for x in weights
    ]
    Cp = -(-C // 8) * 8

    @jax.jit
    def decode(llr: Array) -> Array:
        B = llr.shape[0]
        if B % Bt:
            pad = Bt - B % Bt
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        nt = Bp // Bt
        g = llr.reshape(nt, Bt, C, Z).transpose(0, 2, 3, 1).reshape(nt, C, Z * Bt)
        g = jnp.pad(g, ((0, 0), (0, Cp - C), (0, lanes - Z * Bt))).reshape(
            nt * Cp, lanes
        )
        soft = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm)]
            + wspecs,
            out_specs=pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((nt * Cp, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((h, K * lanes), jnp.bfloat16),  # feats (lane-blocked)
                pltpu.VMEM((h, (C if input_injection else 1) * lanes),
                           jnp.bfloat16),  # llr feats
                pltpu.VMEM((h, C * lanes), jnp.bfloat16),  # var-relation means
                pltpu.VMEM((h, st.R * lanes), jnp.bfloat16),  # check-relation means
                pltpu.VMEM((h, C * lanes), jnp.float32),  # per-column precompute
                pltpu.VMEM((h, st.R * lanes), jnp.float32),  # per-row precompute
                pltpu.VMEM((2 * h, (C if input_injection else 1) * lanes),
                           jnp.float32),  # per-column LLR precompute
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(g, *weights)
        soft = (
            soft.reshape(nt, Cp, lanes)[:, :C, : Z * Bt]
            .reshape(nt, C, Z, Bt)
            .transpose(0, 3, 1, 2)
            .reshape(Bp, n)
        )
        return soft[:B]

    return decode


# ---------------------------------------------------------------------------
# v3 kernel: element-count reduction (VERDICT r2 item 7)
# ---------------------------------------------------------------------------
#
# v1 == v2 in measured throughput, and both match the per-ELEMENT VPU
# accounting of their instruction streams (~24 (h, lanes) element-block ops
# per base edge per iteration at Z=32) — the kernel retires VPU elements at
# device rate, so the only lever left is issuing fewer elements.  v3 keeps
# v2's lane-blocked layout and big-matmul structure and removes element
# work:
#
# * type embeddings ride IN the feature stream: the writeback adds a
#   precomputed per-(iteration, edge) delta column (te_{t+1} - te_t, the
#   residual algebra keeps the stream exact), so the two per-edge bias1
#   adds (which existed only to carry the te fold) collapse into one delta
#   add and the (T, h, K) bias tables disappear;
# * the scalar first-layer biases b1v/b1c fold into the per-column /
#   per-row precomputes (C + R adds instead of 2K; b1c is lane-constant so
#   the per-edge roll leaves it invariant);
# * the LLR-injection column term folds into pre_col (C adds, not K);
# * the check-relation aggregate is projected BEFORE rolling
#   (roll(W @ x) == W @ roll(x)): the per-edge roll moves to the f32
#   matmul output, killing the bf16<->f32 cast round-trips of the v1/v2
#   row-mean path (5 element ops -> 2);
# * first layer + check-relation projection run as ONE whole-graph matmul
#   ([W1vf; W1cf; W1ca] @ feats), the second layer as one whole-graph
#   matmul over an h1 scratch written in place by the per-edge epilogue
#   (no concatenates), with a constant ones-row carrying b2;
# * iteration 0 is peeled so the residual gate multiply disappears.
#
# Net: ~14 element-block ops per edge per iteration with input injection
# (~13 without) vs ~24 — yet measured SLOWER than v1/v2 on the real chip
# (22.2 vs 28.1 Mbit/s, docs/PERFORMANCE.md round 3): the whole-graph
# (3h, K*lanes) f32 first-layer scratch plus the whole-graph h1 cost more
# in VMEM write+read traffic than the removed element ops saved.  Kept as
# the measured data point that motivates the group-wise v4 below; v1
# remains the default fully-neural kernel unless v4 beats it.  Numerics:
# same bf16 feature stream, f32 pre-activations; b2 enters through the
# bf16 ones-row matmul instead of a f32 add (covered by the kernel parity
# tolerances).


def _extract_v3(params, qc: QCLayout, num_iterations: int, hidden_dim: int,
                share_layers: bool, input_injection: bool):
    """Flax param tree -> v3 weight tables (te kept raw, biases unfolded)."""
    p = params["params"] if "params" in params else params
    h = hidden_dim
    T = num_iterations
    K = qc.num_base_edges

    emb_w = np.asarray(p["input_embedding"]["kernel"], np.float32).reshape(h)
    emb_b = np.asarray(p["input_embedding"]["bias"], np.float32).reshape(h)
    proj_w = np.asarray(p["output_projection"]["kernel"], np.float32).reshape(h)
    proj_b = float(np.asarray(p["output_projection"]["bias"]).reshape(()))

    W1vf = np.zeros((T, h, h), np.float32)
    W1cf = np.zeros((T, h, h), np.float32)
    W1va = np.zeros((T, h, h), np.float32)
    W1ca = np.zeros((T, h, h), np.float32)
    W1vl = np.zeros((T, h, h), np.float32)
    W1cl = np.zeros((T, h, h), np.float32)
    W2v = np.zeros((T, h, h), np.float32)
    W2c = np.zeros((T, h, h), np.float32)
    b1v = np.zeros((T, h), np.float32)
    b1c = np.zeros((T, h), np.float32)
    b2 = np.zeros((T, h), np.float32)
    te = np.zeros((T, K, h), np.float32)

    for t in range(T):
        lp = p["gnn_layer" if share_layers else f"gnn_layer_{t}"]
        te[t] = np.asarray(lp["message_type_embeddings"], np.float32)[
            np.asarray(qc.edge_type)
        ]
        for prefix, W1f, W1a, W1l, W2, bb1, side in (
            ("var_to_check_update", W1vf, W1va, W1vl, W2v, b1v, "v"),
            ("check_to_var_update", W1cf, W1ca, W1cl, W2c, b1c, "c"),
        ):
            k1 = np.asarray(lp[prefix]["Dense_0"]["kernel"], np.float32)  # (h_in, h)
            W1f[t] = k1[0:h].T
            W1a[t] = k1[h : 2 * h].T
            if input_injection:
                W1l[t] = k1[2 * h : 3 * h].T
            bb1[t] = np.asarray(lp[prefix]["Dense_0"]["bias"], np.float32)
            W2[t] = np.asarray(lp[prefix]["Dense_1"]["kernel"], np.float32).T
            b2[t] += np.asarray(lp[prefix]["Dense_1"]["bias"], np.float32)

    return dict(
        emb_w=emb_w, emb_b=emb_b, proj_w=proj_w, proj_b=proj_b,
        W1vf=W1vf, W1cf=W1cf, W1va=W1va, W1ca=W1ca, W1vl=W1vl, W1cl=W1cl,
        W2v=W2v, W2c=W2c, b1v=b1v, b1c=b1c, b2=b2, te=te,
    )


def _kernel_v3(llr_ref, w1g_ref, w1va_ref, w1l_ref, w2_ref, pcb_ref, prb_ref,
               dte_ref, emb_ref, soft_ref,
               feats, llr_feats, var_mean, gall, h1, pre_col, pre_row, pre_llr,
               *, st, h: int, T: int, Bt: int, lanes: int, inject: bool):
    Z, K, C, R = st.Z, st.K, st.C, st.R
    packed = Bt > 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def roll_f32(x, s):
        if packed:
            s = (s % Z) * Bt
            return pltpu.roll(x, s, 1) if s else x
        return _roll_lanes(x, s, Z)

    def lb(k):
        return pl.ds(k * lanes, lanes)

    # ---- seed: feats0 = emb(llr) + te_0 -----------------------------------
    emb_w = emb_ref[0:h, 0:1]
    emb_b = emb_ref[h : 2 * h, 0:1]
    for c in range(C):
        row = llr_ref[c : c + 1, :]
        f0 = jnp.broadcast_to(row, (h, lanes)) * emb_w + emb_b
        if inject:
            llr_feats[:, lb(c)] = f0.astype(bf16)
        for k in st.col_members[c]:
            feats[:, lb(k)] = (f0 + dte_ref[0:h, k : k + 1]).astype(bf16)
    # constant ones-row of the h1 scratch (carries b2 through the matmul)
    h1[pl.ds(2 * h, 8), :] = jnp.concatenate(
        [jnp.ones((1, K * lanes), bf16), jnp.zeros((7, K * lanes), bf16)], axis=0
    )

    inv_dc = [1.0 / max(len(st.col_members[c]), 1) for c in range(C)]

    def iteration(t, carry=0, *, first: bool):
        th = pl.ds(t * h, h)
        t2h = pl.ds(t * 2 * h, 2 * h)
        t3h = pl.ds(t * 3 * h, 3 * h)
        # ---- var-relation means (VPU sums; projecting the C-wide mean is
        # 3.8x less MXU than projecting all K edges) ------------------------
        for c in range(C):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + feats[:, lb(k)].astype(f32)
            var_mean[:, lb(c)] = (acc * inv_dc[c]).astype(bf16)

        # ---- whole-graph first layer + check-relation projection ----------
        gall[:, :] = jnp.dot(w1g_ref[t3h, 0:h], feats[:, :],
                             preferred_element_type=f32)
        # pre_row[r] = inv_dr * sum roll(W1ca @ feats_k) + b1c  (f32 rolls)
        for r in range(R):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.row_members[r]:
                acc = acc + roll_f32(gall[pl.ds(2 * h, h), lb(k)], -st.shifts[k])
            pre_row[:, lb(r)] = acc * (
                1.0 / max(len(st.row_members[r]), 1)
            ) + jnp.broadcast_to(prb_ref[th, r : r + 1], (h, lanes))
        # pre_col[c] = W1va @ var_mean + b1v (+ LLR column term)
        pre_col[:, :] = jnp.dot(w1va_ref[th, 0:h], var_mean[:, :],
                                preferred_element_type=f32)
        if inject:
            pre_llr[:, :] = jnp.dot(w1l_ref[t2h, 0:h], llr_feats[:, :],
                                    preferred_element_type=f32)
        for c in range(C):
            pc = pre_col[:, lb(c)] + jnp.broadcast_to(
                pcb_ref[th, c : c + 1], (h, lanes)
            )
            if inject:
                pc = pc + pre_llr[0:h, lb(c)]
            pre_col[:, lb(c)] = pc

        # ---- per-edge epilogue -> h1 scratch ------------------------------
        for k in range(K):
            c_k, r_k = st.cols[k], st.rows[k]
            pv = gall[0:h, lb(k)] + pre_col[:, lb(c_k)]
            h1[0:h, lb(k)] = jnp.maximum(pv, 0.0).astype(bf16)
            pc = (gall[pl.ds(h, h), lb(k)]
                  + roll_f32(pre_row[:, lb(r_k)], st.shifts[k]))
            if inject:
                pc = pc + pre_llr[pl.ds(h, h), lb(c_k)]
            h1[pl.ds(h, h), lb(k)] = jnp.maximum(pc, 0.0).astype(bf16)

        # ---- whole-graph second layer + writeback -------------------------
        out = jnp.dot(w2_ref[th, 0 : 2 * h + 8], h1[:, :],
                      preferred_element_type=f32).astype(bf16)
        if first:  # t = 0: no residual; te_1 delta folded into dte row 1
            for k in range(K):
                feats[:, lb(k)] = out[:, k * lanes : (k + 1) * lanes] + dte_ref[
                    pl.ds(h, h), k : k + 1
                ].astype(bf16)
        else:
            dth = pl.ds(t * h + h, h)
            for k in range(K):
                feats[:, lb(k)] = (out[:, k * lanes : (k + 1) * lanes]
                                   + feats[:, lb(k)]
                                   + dte_ref[dth, k : k + 1].astype(bf16))
        return 0

    iteration(0, first=True)
    if T > 1:
        jax.lax.fori_loop(1, T, functools.partial(iteration, first=False), 0,
                          unroll=False)

    # ---- output: proj, per-variable sum, sigmoid --------------------------
    proj_w = emb_ref[2 * h : 3 * h, 0:1]
    proj_b = emb_ref[3 * h : 3 * h + 1, 0:1]
    for c in range(C):
        acc = jnp.zeros((1, lanes), f32)
        for k in st.col_members[c]:
            contrib = jnp.sum(feats[:, lb(k)].astype(f32) * proj_w, axis=0,
                              keepdims=True)
            acc = acc + contrib + proj_b
        combined = llr_ref[c : c + 1, :] + acc
        soft_ref[c : c + 1, :] = 1.0 / (1.0 + jnp.exp(combined))


def gnn_v3_vmem_bytes(qc: QCLayout, hidden_dim: int, lanes: int,
                      input_injection: bool) -> int:
    K, C, R = qc.num_base_edges, qc.num_base_cols, qc.num_base_rows
    h = hidden_dim
    bf16 = (K + (C if input_injection else 0) + C) * h * lanes * 2  # feats/llr/mean
    bf16 += (2 * h + 8) * K * lanes * 2  # h1
    f32 = (3 * K + C + R + (2 * C if input_injection else 0)) * h * lanes * 4
    return bf16 + f32 + 2 * C * lanes * 4


def make_fused_gnn_decoder_v3(
    qc: QCLayout,
    params,
    num_iterations: int = 5,
    hidden_dim: int = 64,
    share_layers: bool = False,
    input_injection: bool = False,
    interpret: bool = False,
):
    """Element-count-reduced variant of :func:`make_fused_gnn_decoder`.

    Same serving semantics (bf16 feature stream, f32 pre-activations); see
    the design comment above `_extract_v3`.  Parity with the XLA module and
    the v1 kernel is asserted in tests/test_pallas_gnn.py.
    """
    st = _GNNStructure(qc)
    Z, C, K, h = st.Z, st.C, st.K, hidden_dim
    n = C * Z
    T = num_iterations
    if h % 8:
        raise ValueError(f"hidden_dim must be a multiple of 8, got {h}")
    if 128 % Z == 0:
        Bt, lanes = 128 // Z, 128
    elif Z % 8 == 0:
        Bt, lanes = 1, -(-Z // 128) * 128
    else:
        raise ValueError(f"fused GNN kernel requires Z % 8 == 0 or Z | 128, got Z={Z}")
    need = gnn_v3_vmem_bytes(qc, h, lanes, input_injection)
    budget = 56 * 2**20
    if need > budget:
        raise ValueError(
            f"v3 GNN state ({need / 2**20:.1f} MiB) exceeds the "
            f"{budget / 2**20:.0f} MiB scratch budget (Z={Z}, h={h})"
        )

    w = _extract_v3(params, qc, T, h, share_layers, input_injection)
    Kpad = -(-K // 128) * 128

    def stack(x, pad_to):  # (T, h, d) -> (T*h, pad_to)
        T_, hh, d = x.shape
        out = np.zeros((T_ * hh, pad_to), x.dtype)
        out[:, :d] = x.reshape(T_ * hh, d)
        return out

    # first-layer + check-relation stack: per t, [W1vf; W1cf; W1ca] (3h, h)
    w1g = np.zeros((T * 3 * h, 128), np.float32)
    for t in range(T):
        w1g[t * 3 * h : t * 3 * h + h, :h] = w["W1vf"][t]
        w1g[t * 3 * h + h : t * 3 * h + 2 * h, :h] = w["W1cf"][t]
        w1g[t * 3 * h + 2 * h : (t + 1) * 3 * h, :h] = w["W1ca"][t]
    w1g = jnp.asarray(w1g, jnp.bfloat16)
    w1va = jnp.asarray(stack(w["W1va"], 128), jnp.bfloat16)
    # LLR-injection stack: per t, [W1vl; W1cl] (2h, h) — only the c-side
    # term stays per-edge; the v-side folds into pre_col
    w1l = np.zeros((T * 2 * h, 128), np.float32)
    if input_injection:
        for t in range(T):
            w1l[t * 2 * h : t * 2 * h + h, :h] = w["W1vl"][t]
            w1l[t * 2 * h + h : (t + 1) * 2 * h, :h] = w["W1cl"][t]
    w1l = jnp.asarray(w1l, jnp.bfloat16)
    # second layer with b2 ones-row column: per t, [W2v W2c b2 0...] (h, 2h+8)
    w2 = np.zeros((T * h, max(2 * h + 8, 128)), np.float32)
    for t in range(T):
        w2[t * h : (t + 1) * h, : 2 * h] = np.concatenate(
            [w["W2v"][t], w["W2c"][t]], axis=1
        )
        w2[t * h : (t + 1) * h, 2 * h] = w["b2"][t]
    w2 = jnp.asarray(w2, jnp.bfloat16)
    pcb = jnp.asarray(np.repeat(w["b1v"].reshape(T * h, 1), 128, 1), jnp.float32)
    prb = jnp.asarray(np.repeat(w["b1c"].reshape(T * h, 1), 128, 1), jnp.float32)
    # te delta table, applied at the END of iteration t-1 (te_T = 0):
    # block 0 = te_0 (seed); block 1 = te_1 FULL (iteration 0 is peeled with
    # no residual, so its writeback carries no te_0 to cancel); block t >= 2
    # = te_t - te_{t-1} (the residual stream carries te_{t-1}).
    dte = np.zeros(((T + 1) * h, Kpad), np.float32)
    te = w["te"]  # (T, K, h)
    dte[0:h, :K] = te[0].T
    for t in range(1, T + 1):
        nxt = te[t] if t < T else np.zeros_like(te[0])
        prev = np.zeros_like(te[0]) if t == 1 else te[t - 1]
        dte[t * h : (t + 1) * h, :K] = (nxt - prev).T
    dte = jnp.asarray(dte, jnp.float32)
    emb = np.zeros((3 * h + 8, 128), np.float32)
    emb[0:h, :] = w["emb_w"][:, None]
    emb[h : 2 * h, :] = w["emb_b"][:, None]
    emb[2 * h : 3 * h, :] = w["proj_w"][:, None]
    emb[3 * h, :] = w["proj_b"]
    emb = jnp.asarray(emb)

    kernel = functools.partial(
        _kernel_v3, st=st, h=h, T=T, Bt=Bt, lanes=lanes, inject=input_injection,
    )
    vm = pltpu.VMEM
    weights = (w1g, w1va, w1l, w2, pcb, prb, dte, emb)
    wspecs = [
        pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=vm) for x in weights
    ]
    Cp = -(-C // 8) * 8

    @jax.jit
    def decode(llr: Array) -> Array:
        B = llr.shape[0]
        if B % Bt:
            pad = Bt - B % Bt
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        nt = Bp // Bt
        g = llr.reshape(nt, Bt, C, Z).transpose(0, 2, 3, 1).reshape(nt, C, Z * Bt)
        g = jnp.pad(g, ((0, 0), (0, Cp - C), (0, lanes - Z * Bt))).reshape(
            nt * Cp, lanes
        )
        soft = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm)]
            + wspecs,
            out_specs=pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((nt * Cp, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((h, K * lanes), jnp.bfloat16),  # feats (with te)
                pltpu.VMEM((h, (C if input_injection else 1) * lanes),
                           jnp.bfloat16),  # llr feats
                pltpu.VMEM((h, C * lanes), jnp.bfloat16),  # var-relation means
                pltpu.VMEM((3 * h, K * lanes), jnp.float32),  # first-layer out
                pltpu.VMEM((2 * h + 8, K * lanes), jnp.bfloat16),  # h1 (+ones)
                pltpu.VMEM((h, C * lanes), jnp.float32),  # pre_col
                pltpu.VMEM((h, st.R * lanes), jnp.float32),  # pre_row
                pltpu.VMEM((2 * h, (C if input_injection else 1) * lanes),
                           jnp.float32),  # per-column LLR precompute
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(g, *weights)
        soft = (
            soft.reshape(nt, Cp, lanes)[:, :C, : Z * Bt]
            .reshape(nt, C, Z, Bt)
            .transpose(0, 3, 1, 2)
            .reshape(Bp, n)
        )
        return soft[:B]

    return decode


# ---------------------------------------------------------------------------
# v4 kernel: group-wise hybrid (VERDICT r3 item 4)
# ---------------------------------------------------------------------------
#
# v3's element diet removes ~10 block ops/edge/iteration vs v2 but pays with
# a (3h, K*lanes) f32 whole-graph first-layer scratch (~19 MB at production
# scale) plus a whole-graph h1, whose VMEM write+read traffic measured
# SLOWER than v2 overall (docs/PERFORMANCE.md round 3).  v4 is v2's
# group-wise structure (register-held h1 concats — a first group-scratch
# variant that staged h1 in a reused VMEM tile measured 19.6 vs v2's 26.7
# Mbit/s: the tile reuse serializes groups) with v3's algebraic folds
# stacked on top:
#
# * te deltas ride the feature stream (one writeback add instead of two
#   per-edge bias1 adds);
# * scalar b1v/b1c and the LLR v-side column term fold into the
#   pre_col/pre_row precomputes (C + R adds instead of 2-3K);
# * the row-relation mean accumulates single-cast f32 rolls
#   (``roll_f32(feats.astype(f32))``) instead of v2's bf16 roll helper
#   round-trip (3 casts/edge -> 1);
# * iteration 0 is peeled (no residual-gate multiply);
# * NEW fold beyond v3: the LAST iteration's second layer collapses into a
#   thin row-matmul.  The final features are only ever read through the
#   scalar output projection, which is linear (the corrected-v2 trick,
#   applied to the fully-neural decoder's final step):
#       proj^T feats_T = (proj^T [W2v W2c]) @ h1 + proj^T b2
#                        + proj^T feats_{T-1} - proj^T te_{T-1}
#   -> one (8, 2h) and one (8, h) thin matmul per group plus a per-edge
#   scalar table (dsc, which also carries proj_b and proj^T b2); the
#   (h, 2h) second-layer matmul, the K feature writebacks, and the output
#   stage's K (h, lanes) projection reductions all disappear at t = T-1.
#
# Reference parity target: `message_gnn_decoder.py:155-353` (intended
# semantics), same as v1; asserted against the Flax module and the v1
# kernel in tests/test_pallas_gnn.py.


def _kernel_v4(llr_ref, w1f_ref, w1va_ref, w1ca_ref, w1l_ref, w2vc_ref,
               b2_ref, w2last_ref, proj8_ref, pcb_ref, prb_ref, dte_ref,
               dsc_ref, emb_ref, soft_ref,
               feats, llr_feats, var_mean, row_mean, s_all,
               pre_col, pre_row, pre_llr,
               *, st, h: int, T: int, Bt: int, lanes: int, inject: bool,
               mm_group: int = 16):
    Z, K, C, R = st.Z, st.K, st.C, st.R
    packed = Bt > 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def roll_f32(x, s):
        if packed:
            s = (s % Z) * Bt
            return pltpu.roll(x, s, 1) if s else x
        return _roll_lanes(x, s, Z)

    def lb(k):
        return pl.ds(k * lanes, lanes)

    groups = [list(range(g, min(g + mm_group, K))) for g in range(0, K, mm_group)]

    # ---- seed: feats0 = emb(llr) + te_0 -----------------------------------
    emb_w = emb_ref[0:h, 0:1]
    emb_b = emb_ref[h : 2 * h, 0:1]
    for c in range(C):
        row = llr_ref[c : c + 1, :]
        f0 = jnp.broadcast_to(row, (h, lanes)) * emb_w + emb_b
        if inject:
            llr_feats[:, lb(c)] = f0.astype(bf16)
        for k in st.col_members[c]:
            feats[:, lb(k)] = (f0 + dte_ref[0:h, k : k + 1]).astype(bf16)

    inv_dc = [1.0 / max(len(st.col_members[c]), 1) for c in range(C)]
    inv_dr = [1.0 / max(len(st.row_members[r]), 1) for r in range(R)]

    def aggregates(t):
        """pre_col / pre_row / pre_llr for iteration t (b1 biases folded)."""
        th = pl.ds(t * h, h)
        t2h = pl.ds(t * 2 * h, 2 * h)
        for c in range(C):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + feats[:, lb(k)].astype(f32)
            var_mean[:, lb(c)] = (acc * inv_dc[c]).astype(bf16)
        # single-cast f32 rolls (v2's bf16 roll helper costs 3 casts/edge)
        for r in range(R):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.row_members[r]:
                acc = acc + roll_f32(feats[:, lb(k)].astype(f32), -st.shifts[k])
            row_mean[:, lb(r)] = (acc * inv_dr[r]).astype(bf16)
        pre_col[:, :] = jnp.dot(w1va_ref[th, 0:h], var_mean[:, :],
                                preferred_element_type=f32)
        pre_row[:, :] = jnp.dot(w1ca_ref[th, 0:h], row_mean[:, :],
                                preferred_element_type=f32)
        if inject:
            pre_llr[:, :] = jnp.dot(w1l_ref[t2h, 0:h], llr_feats[:, :],
                                    preferred_element_type=f32)
        for c in range(C):
            pc = pre_col[:, lb(c)] + jnp.broadcast_to(
                pcb_ref[th, c : c + 1], (h, lanes)
            )
            if inject:
                pc = pc + pre_llr[0:h, lb(c)]
            pre_col[:, lb(c)] = pc
        for r in range(R):
            pre_row[:, lb(r)] = pre_row[:, lb(r)] + jnp.broadcast_to(
                prb_ref[th, r : r + 1], (h, lanes)
            )

    def group_h1(t, grp):
        """First layer + relu for one edge group, h1 held in registers
        (a reused VMEM h1 tile serializes groups — see design comment)."""
        g0, gn = grp[0], len(grp)
        gsl = pl.ds(g0 * lanes, gn * lanes)
        f_g = feats[:, gsl]
        p_g = jnp.dot(w1f_ref[pl.ds(t * 2 * h, 2 * h), 0:h], f_g,
                      preferred_element_type=f32)
        parts_v, parts_c = [], []
        for j, k in enumerate(grp):
            c_k, r_k = st.cols[k], st.rows[k]
            jl = slice(j * lanes, (j + 1) * lanes)
            pv = p_g[0:h, jl] + pre_col[:, lb(c_k)]
            pc = p_g[h : 2 * h, jl] + roll_f32(pre_row[:, lb(r_k)], st.shifts[k])
            if inject:
                pc = pc + pre_llr[pl.ds(h, h), lb(c_k)]
            parts_v.append(jnp.maximum(pv, 0.0).astype(bf16))
            parts_c.append(jnp.maximum(pc, 0.0).astype(bf16))
        h1_g = jnp.concatenate(
            [jnp.concatenate(parts_v, axis=1),
             jnp.concatenate(parts_c, axis=1)], axis=0
        )  # (2h, gn*lanes)
        return f_g, gsl, gn, h1_g

    def iteration_mid(t, first: bool):
        aggregates(t)
        th = pl.ds(t * h, h)
        dth = pl.ds((t + 1) * h, h)
        b2 = b2_ref[th, 0:1]
        for grp in groups:
            f_g, gsl, gn, h1_g = group_h1(t, grp)
            out = (jnp.dot(w2vc_ref[th, 0 : 2 * h], h1_g,
                           preferred_element_type=f32) + b2).astype(bf16)
            for j, k in enumerate(grp):
                jl = slice(j * lanes, (j + 1) * lanes)
                nf = out[:, jl] + dte_ref[dth, k : k + 1].astype(bf16)
                if not first:
                    nf = nf + feats[:, lb(k)]
                feats[:, lb(k)] = nf
        return 0

    def iteration_last(t, include_residual: bool):
        aggregates(t)
        for grp in groups:
            f_g, gsl, gn, h1_g = group_h1(t, grp)
            s_g = jnp.dot(w2last_ref[0:8, 0 : 2 * h], h1_g,
                          preferred_element_type=f32)
            if include_residual:
                s_g = s_g + jnp.dot(proj8_ref[0:8, 0:h], f_g,
                                    preferred_element_type=f32)
            s_all[:, gsl] = s_g

    if T == 1:
        iteration_last(0, include_residual=False)
    else:
        iteration_mid(0, first=True)
        if T > 2:
            jax.lax.fori_loop(1, T - 1,
                              lambda t, c: iteration_mid(t, first=False), 0,
                              unroll=False)
        iteration_last(T - 1, include_residual=True)

    # ---- output: thin per-edge scalars, per-variable sum, sigmoid ---------
    for c in range(C):
        acc = jnp.zeros((1, lanes), f32)
        for k in st.col_members[c]:
            acc = acc + s_all[0:1, lb(k)] + dsc_ref[0:1, k : k + 1]
        combined = llr_ref[c : c + 1, :] + acc
        soft_ref[c : c + 1, :] = 1.0 / (1.0 + jnp.exp(combined))


def gnn_v4_vmem_bytes(qc: QCLayout, hidden_dim: int, lanes: int,
                      input_injection: bool, mm_group: int = 16) -> int:
    K, C, R = qc.num_base_edges, qc.num_base_cols, qc.num_base_rows
    h = hidden_dim
    bf16 = (K + C + R + (C if input_injection else 0)) * h * lanes * 2
    f32 = (C + R + (2 * C if input_injection else 0)) * h * lanes * 4
    f32 += 8 * K * lanes * 4  # s_all
    return bf16 + f32 + 2 * C * lanes * 4


def make_fused_gnn_decoder_v4(
    qc: QCLayout,
    params,
    num_iterations: int = 5,
    hidden_dim: int = 64,
    share_layers: bool = False,
    input_injection: bool = False,
    mm_group: int = 16,
    interpret: bool = False,
):
    """Group-wise hybrid variant of :func:`make_fused_gnn_decoder`.

    Same serving semantics as v1/v2/v3 (bf16 feature stream, f32
    pre-activations); see the design comment above `_kernel_v4`.
    """
    st = _GNNStructure(qc)
    Z, C, K, h = st.Z, st.C, st.K, hidden_dim
    n = C * Z
    T = num_iterations
    if h % 8:
        raise ValueError(f"hidden_dim must be a multiple of 8, got {h}")
    if 128 % Z == 0:
        Bt, lanes = 128 // Z, 128
    elif Z % 8 == 0:
        Bt, lanes = 1, -(-Z // 128) * 128
    else:
        raise ValueError(f"fused GNN kernel requires Z % 8 == 0 or Z | 128, got Z={Z}")
    need = gnn_v4_vmem_bytes(qc, h, lanes, input_injection, mm_group)
    budget = 48 * 2**20
    if need > budget:
        raise ValueError(
            f"v4 GNN state ({need / 2**20:.1f} MiB) exceeds the "
            f"{budget / 2**20:.0f} MiB scratch budget (Z={Z}, h={h})"
        )

    w = _extract_v3(params, qc, T, h, share_layers, input_injection)
    Kpad = -(-K // 128) * 128

    def stack(x, pad_to):  # (T, h, d) -> (T*h, pad_to)
        T_, hh, d = x.shape
        out = np.zeros((T_ * hh, pad_to), x.dtype)
        out[:, :d] = x.reshape(T_ * hh, d)
        return out

    # first-layer own-features stack: per t, [W1vf; W1cf] (2h, h)
    w1f = np.zeros((T * 2 * h, 128), np.float32)
    for t in range(T):
        w1f[t * 2 * h : t * 2 * h + h, :h] = w["W1vf"][t]
        w1f[t * 2 * h + h : (t + 1) * 2 * h, :h] = w["W1cf"][t]
    w1f = jnp.asarray(w1f, jnp.bfloat16)
    w1va = jnp.asarray(stack(w["W1va"], 128), jnp.bfloat16)
    w1ca = jnp.asarray(stack(w["W1ca"], 128), jnp.bfloat16)
    w1l = np.zeros((T * 2 * h, 128), np.float32)
    if input_injection:
        for t in range(T):
            w1l[t * 2 * h : t * 2 * h + h, :h] = w["W1vl"][t]
            w1l[t * 2 * h + h : (t + 1) * 2 * h, :h] = w["W1cl"][t]
    w1l = jnp.asarray(w1l, jnp.bfloat16)
    # second layer [W2v W2c] (b2 added as a f32 column like v2; the last
    # iteration's block is unused — thin fold)
    w2vc = jnp.asarray(
        stack(np.concatenate([w["W2v"], w["W2c"]], axis=2), max(2 * h, 128)),
        jnp.bfloat16,
    )
    b2 = jnp.asarray(np.repeat(w["b2"].reshape(T * h, 1), 128, 1), jnp.float32)
    # thin folded last layer: proj^T [W2v W2c]
    pw = w["proj_w"]
    w2last = np.zeros((8, max(2 * h, 128)), np.float32)
    w2last[0, 0:h] = pw @ w["W2v"][T - 1]
    w2last[0, h : 2 * h] = pw @ w["W2c"][T - 1]
    w2last = jnp.asarray(w2last, jnp.bfloat16)
    proj8 = np.zeros((8, 128), np.float32)
    proj8[0, :h] = pw
    proj8 = jnp.asarray(proj8, jnp.bfloat16)
    pcb = jnp.asarray(np.repeat(w["b1v"].reshape(T * h, 1), 128, 1), jnp.float32)
    prb = jnp.asarray(np.repeat(w["b1c"].reshape(T * h, 1), 128, 1), jnp.float32)
    # te delta table (same as v3); only blocks 0..T-1 are read — the final
    # -te_{T-1} fold moves into the dsc scalar table
    dte = np.zeros(((T + 1) * h, Kpad), np.float32)
    te = w["te"]  # (T, K, h)
    dte[0:h, :K] = te[0].T
    for t in range(1, T + 1):
        nxt = te[t] if t < T else np.zeros_like(te[0])
        prev = np.zeros_like(te[0]) if t == 1 else te[t - 1]
        dte[t * h : (t + 1) * h, :K] = (nxt - prev).T
    dte = jnp.asarray(dte, jnp.float32)
    # per-edge output scalars: proj_b (per member) + proj^T b2_{T-1}
    # - proj^T te_{T-1} (the residual stream carries te_{T-1} only for T>1)
    dsc = np.zeros((8, Kpad), np.float32)
    dsc[0, :K] = (w["proj_b"] + pw @ w["b2"][T - 1]
                  - (te[T - 1] @ pw if T > 1 else 0.0))
    dsc = jnp.asarray(dsc, jnp.float32)
    emb = np.zeros((2 * h, 128), np.float32)
    emb[0:h, :] = w["emb_w"][:, None]
    emb[h : 2 * h, :] = w["emb_b"][:, None]
    emb = jnp.asarray(emb)

    kernel = functools.partial(
        _kernel_v4, st=st, h=h, T=T, Bt=Bt, lanes=lanes, inject=input_injection,
        mm_group=mm_group,
    )
    vm = pltpu.VMEM
    weights = (w1f, w1va, w1ca, w1l, w2vc, b2, w2last, proj8, pcb, prb, dte,
               dsc, emb)
    wspecs = [
        pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=vm) for x in weights
    ]
    Cp = -(-C // 8) * 8

    @jax.jit
    def decode(llr: Array) -> Array:
        B = llr.shape[0]
        if B % Bt:
            pad = Bt - B % Bt
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        nt = Bp // Bt
        g = llr.reshape(nt, Bt, C, Z).transpose(0, 2, 3, 1).reshape(nt, C, Z * Bt)
        g = jnp.pad(g, ((0, 0), (0, Cp - C), (0, lanes - Z * Bt))).reshape(
            nt * Cp, lanes
        )
        soft = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm)]
            + wspecs,
            out_specs=pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((nt * Cp, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((h, K * lanes), jnp.bfloat16),  # feats (with te)
                pltpu.VMEM((h, (C if input_injection else 1) * lanes),
                           jnp.bfloat16),  # llr feats
                pltpu.VMEM((h, C * lanes), jnp.bfloat16),  # var-relation means
                pltpu.VMEM((h, st.R * lanes), jnp.bfloat16),  # check-rel means
                pltpu.VMEM((8, K * lanes), jnp.float32),  # thin output scalars
                pltpu.VMEM((h, C * lanes), jnp.float32),  # pre_col
                pltpu.VMEM((h, st.R * lanes), jnp.float32),  # pre_row
                pltpu.VMEM((2 * h, (C if input_injection else 1) * lanes),
                           jnp.float32),  # per-column LLR precompute
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(g, *weights)
        soft = (
            soft.reshape(nt, Cp, lanes)[:, :C, : Z * Bt]
            .reshape(nt, C, Z, Bt)
            .transpose(0, 3, 1, 2)
            .reshape(Bp, n)
        )
        return soft[:B]

    return decode


# ---------------------------------------------------------------------------
# Corrected-mode serving kernel (flagship): min-sum + GNN corrections
# ---------------------------------------------------------------------------


def _extract_corrected(params, qc: QCLayout, num_iterations: int, hidden_dim: int,
                       share_layers: bool, input_injection: bool):
    """Params of a var/check="corrected" MessageGNNDecoder -> packed arrays.

    Per iteration there are TWO GNN layers (check-half, var-half); stacks are
    indexed ``2*t`` (check) / ``2*t + 1`` (var).
    """
    p = params["params"] if "params" in params else params
    h = hidden_dim
    T = num_iterations
    K = qc.num_base_edges
    h_in = 3 * h if input_injection else 2 * h

    emb_w = np.asarray(p["input_embedding"]["kernel"], np.float32).reshape(h)
    emb_b = np.asarray(p["input_embedding"]["bias"], np.float32).reshape(h)
    w_ch = float(np.asarray(p["w_ch"]).reshape(()))
    alpha = float(np.asarray(p["alpha"]).reshape(()))

    col_members = [[] for _ in range(qc.num_base_cols)]
    row_members = [[] for _ in range(qc.num_base_rows)]
    for k in range(K):
        col_members[qc.edge_col[k]].append(k)
        row_members[qc.edge_row[k]].append(k)

    T2 = 2 * T
    W1v = np.zeros((T2, h, h_in), np.float32)
    W2v = np.zeros((T2, h, h), np.float32)
    W1c = np.zeros((T2, h, h_in), np.float32)
    W2c = np.zeros((T2, h, h), np.float32)
    b2v = np.zeros((T2, h), np.float32)
    b2c = np.zeros((T2, h), np.float32)
    bias1v = np.zeros((T2, h, K), np.float32)
    bias1c = np.zeros((T2, h, K), np.float32)
    proj_w = np.zeros((T2, h), np.float32)
    proj_b = np.zeros((T2,), np.float32)

    for t in range(T):
        for half, prefix in ((0, "check"), (1, "var")):
            name = prefix if share_layers else f"{prefix}_{t}"
            lp = p[f"{name}_gnn"]
            pr = p[f"{name}_proj"]
            idx = 2 * t + half
            proj_w[idx] = np.asarray(pr["kernel"], np.float32).reshape(h)
            proj_b[idx] = float(np.asarray(pr["bias"]).reshape(()))
            te = np.asarray(lp["message_type_embeddings"], np.float32)
            te_edge = te[np.asarray(qc.edge_type)]
            te_var = np.stack([
                te_edge[col_members[qc.edge_col[k]]].mean(axis=0) for k in range(K)
            ])
            te_chk = np.stack([
                te_edge[row_members[qc.edge_row[k]]].mean(axis=0) for k in range(K)
            ])
            for rel, W1, W2, b2, bias1, te_agg in (
                ("var_to_check_update", W1v, W2v, b2v, bias1v, te_var),
                ("check_to_var_update", W1c, W2c, b2c, bias1c, te_chk),
            ):
                k1 = np.asarray(lp[rel]["Dense_0"]["kernel"], np.float32)
                bb1 = np.asarray(lp[rel]["Dense_0"]["bias"], np.float32)
                k2 = np.asarray(lp[rel]["Dense_1"]["kernel"], np.float32)
                bb2 = np.asarray(lp[rel]["Dense_1"]["bias"], np.float32)
                W1[idx] = k1.T
                W2[idx] = k2.T
                b2[idx] = bb2
                te_cat = np.zeros((K, h_in), np.float32)
                te_cat[:, :h] = te_edge
                te_cat[:, h : 2 * h] = te_agg
                bias1[idx] = (te_cat @ k1 + bb1).T

    return dict(
        emb_w=emb_w, emb_b=emb_b, w_ch=w_ch, alpha=alpha,
        W1v=W1v, W2v=W2v, W1c=W1c, W2c=W2c, b2v=b2v, b2c=b2c,
        bias1v=bias1v, bias1c=bias1c, proj_w=proj_w, proj_b=proj_b, h_in=h_in,
    )


_BIG = 1e9


def _corrected_kernel(llr_ref, w1v_ref, w2v_ref, w1c_ref, w2c_ref, b1v_ref,
                      b1c_ref, b2v_ref, b2c_ref, emb_ref, proj_ref, soft_ref,
                      *rest, st, h: int,
                      T: int, Bt: int, lanes: int, inject: bool, w_ch: float,
                      alpha: float, early_exit: bool = False,
                      conv_out: bool = False):
    if conv_out:  # optional second output: per-frame convergence iteration
        conv_ref, *rest = rest
    (v2c, c2v, edge_llr, feats, llr_feats, var_mean, row_mean,
     pre_col, pre_row, colsum, frozen, conv_buf) = rest
    Z, K, C, R = st.Z, st.K, st.C, st.R
    packed = Bt > 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def roll(x, s):
        # Mosaic's dynamic_rotate only supports 32-bit data: bf16 feature
        # blocks take a f32 round-trip around the lane rotation.
        if packed:
            s = (s % Z) * Bt
            if s == 0:
                return x
            if x.dtype == jnp.bfloat16:
                return pltpu.roll(x.astype(jnp.float32), s, 1).astype(jnp.bfloat16)
            return pltpu.roll(x, s, 1)
        if x.dtype == jnp.bfloat16:
            return _roll_lanes(x.astype(jnp.float32), s, Z).astype(jnp.bfloat16)
        return _roll_lanes(x, s, Z)

    def fb(k):
        return pl.ds(k * h, h)

    emb_w = emb_ref[0:h, 0:1]
    emb_b = emb_ref[h : 2 * h, 0:1]

    def embed(row):  # (1, lanes) f32 -> (h, lanes) bf16
        return (jnp.broadcast_to(row, (h, lanes)) * emb_w + emb_b).astype(bf16)

    # ---- seed ------------------------------------------------------------
    for c in range(C):
        row = llr_ref[c : c + 1, :]
        if inject:
            llr_feats[fb(c), :] = embed(row)  # per-COLUMN: edges share it
        for k in st.col_members[c]:
            edge_llr[k : k + 1, :] = row
            v2c[k : k + 1, :] = row
            c2v[k : k + 1, :] = jnp.zeros((1, lanes), f32)

    inv_dc = [1.0 / max(len(st.col_members[c]), 1) for c in range(C)]
    inv_dr = [1.0 / max(len(st.row_members[r]), 1) for r in range(R)]

    if early_exit:
        frozen[:] = jnp.zeros_like(frozen)
        conv_buf[:] = jnp.zeros_like(conv_buf)

    def gnn_correction(idx, msgs, out_msgs):
        """out_msgs[k] += proj(GNNLayer_idx(embed(msgs)))  for every edge."""
        ih = pl.ds(idx * h, h)
        for k in range(K):
            feats[fb(k), :] = embed(msgs[k : k + 1, :])
        for c in range(C):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + feats[fb(k), :].astype(f32)
            var_mean[fb(c), :] = (acc * inv_dc[c]).astype(bf16)
        for r in range(R):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.row_members[r]:
                acc = acc + roll(feats[fb(k), :], -st.shifts[k]).astype(f32)
            row_mean[fb(r), :] = (acc * inv_dr[r]).astype(bf16)
        w1v_f = w1v_ref[ih, 0:h]
        w1v_a = w1v_ref[ih, h : 2 * h]
        w1c_f = w1c_ref[ih, 0:h]
        w1c_a = w1c_ref[ih, h : 2 * h]
        w2v = w2v_ref[ih, 0:h]
        w2c = w2c_ref[ih, 0:h]
        b2v = b2v_ref[ih, 0:1]
        b2c = b2c_ref[ih, 0:1]
        pw = proj_ref[ih, 0:1]  # (h, 1)
        pb = proj_ref[pl.ds(2 * T * h + idx, 1), 0:1]  # (1, 1)
        # shared first-layer contractions (see _kernel: the lane roll
        # commutes with the contraction, agg_v/LLR blocks are per-column)
        for c in range(C):
            pc = jnp.dot(w1v_a, var_mean[fb(c), :], preferred_element_type=f32)
            if inject:
                lf = llr_feats[fb(c), :]
                pc = pc + jnp.dot(w1v_ref[ih, 2 * h : 3 * h], lf,
                                  preferred_element_type=f32)
                pre_col[fb(C + c), :] = jnp.dot(w1c_ref[ih, 2 * h : 3 * h], lf,
                                                preferred_element_type=f32)
            pre_col[fb(c), :] = pc
        for r in range(R):
            pre_row[fb(r), :] = jnp.dot(w1c_a, row_mean[fb(r), :],
                                        preferred_element_type=f32)
        for k in range(K):
            f_k = feats[fb(k), :]
            c_k, r_k = st.cols[k], st.rows[k]
            pre_v = (jnp.dot(w1v_f, f_k, preferred_element_type=f32)
                     + pre_col[fb(c_k), :] + b1v_ref[ih, k : k + 1])
            out_v = jnp.dot(w2v, jnp.maximum(pre_v, 0.0).astype(bf16),
                            preferred_element_type=f32) + b2v
            pre_c = (jnp.dot(w1c_f, f_k, preferred_element_type=f32)
                     + roll(pre_row[fb(r_k), :], st.shifts[k])
                     + b1c_ref[ih, k : k + 1])
            if inject:
                pre_c = pre_c + pre_col[fb(C + c_k), :]
            out_c = jnp.dot(w2c, jnp.maximum(pre_c, 0.0).astype(bf16),
                            preferred_element_type=f32) + b2c
            layer_out = (out_v.astype(bf16) + out_c.astype(bf16)).astype(f32)
            corr = jnp.sum(layer_out * pw, axis=0, keepdims=True) + pb
            out_msgs[k : k + 1, :] = out_msgs[k : k + 1, :] + corr

    def iteration(t, _):
        # ---- check half: scaled min-sum + GNN correction -------------------
        for r in range(R):
            members = st.row_members[r]
            rolled = []
            m1 = jnp.full((1, lanes), _BIG, f32)
            m2 = jnp.full((1, lanes), _BIG, f32)
            sp = jnp.ones((1, lanes), f32)
            for k in members:
                x = roll(v2c[k : k + 1, :], -st.shifts[k])
                rolled.append(x)
                sgn = jnp.where(x < 0, -1.0, 1.0)
                mag = jnp.abs(x)
                sp = sp * sgn
                nm = jnp.minimum(mag, m1)
                m2 = jnp.minimum(jnp.maximum(mag, m1), m2)
                m1 = nm
            for k, x in zip(members, rolled):
                sgn = jnp.where(x < 0, -1.0, 1.0)
                mag = jnp.abs(x)
                loo = jnp.where(mag > m1, m1, m2)
                loo = jnp.where(loo < _BIG, loo, 0.0)
                c2v[k : k + 1, :] = roll(alpha * sp * sgn * loo, st.shifts[k])
        gnn_correction(2 * t, v2c, c2v)  # correction sees the update's inputs

        # ---- var half: leave-one-out sum + GNN correction ------------------
        # (two passes: all colsums read the fresh c2v before v2c is touched;
        # colsum scratch stays f32 so the classical skeleton is exact)
        for c in range(C):
            acc = jnp.zeros((1, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + c2v[k : k + 1, :]
            colsum[c : c + 1, :] = acc
        for k in range(K):
            loo = colsum[st.cols[k] : st.cols[k] + 1, :] - c2v[k : k + 1, :]
            v2c[k : k + 1, :] = loo + w_ch * edge_llr[k : k + 1, :]
        gnn_correction(2 * t + 1, c2v, v2c)

        # ---- syndrome tracking + first-valid freezing (early exit) --------
        # Same rule as the fused min-sum kernel: decisions are recorded the
        # first iteration a frame's syndrome is valid; the tile's while_loop
        # stops once every frame froze.  Beliefs reuse the colsum scratch
        # (still the fresh c2v column sums — gnn_correction above only
        # touched v2c).
        if early_exit:
            bits_now = [
                jnp.where(llr_ref[c : c + 1, :] + colsum[c : c + 1, :] < 0.0,
                          1.0, 0.0)
                for c in range(C)
            ]
            viol = jnp.zeros((1, lanes), f32)
            for r in range(R):
                parity = jnp.zeros((1, lanes), f32)
                for k in st.row_members[r]:
                    parity = parity + roll(bits_now[st.cols[k]], -st.shifts[k])
                parity = parity - 2.0 * jnp.floor(parity * 0.5)  # mod 2
                viol = viol + parity
            # log2(Z) lane-rotation tree: every lane accumulates its frame's
            # total violation count (lane = z * Bt + b, rotations by
            # Bt * 2^i stay within the frame's z-group; needs lanes == Z*Bt
            # and Z a power of two — enforced by the factory).
            s = Bt
            while s < Z * Bt:
                viol = viol + pltpu.roll(viol, s, 1)
                s *= 2
            ok = viol == 0.0
            newly = jnp.logical_and(ok, conv_buf[0:1, :] == 0.0)
            for c in range(C):
                frozen[c : c + 1, :] = jnp.where(newly, bits_now[c],
                                                 frozen[c : c + 1, :])
            conv_buf[0:1, :] = jnp.where(newly, jnp.float32(t) + 1.0,
                                         conv_buf[0:1, :])
        return 0

    _run_iterations(iteration, T, early_exit,
                    lambda: jnp.min(conv_buf[0:1, :]) > 0.0)

    # ---- output: llr + colsum(final c2v) -> soft bits ----------------------
    if early_exit:
        conv = conv_buf[0:1, :] > 0.0
    for c in range(C):
        acc = jnp.zeros((1, lanes), f32)
        for k in st.col_members[c]:
            acc = acc + c2v[k : k + 1, :]
        combined = llr_ref[c : c + 1, :] + acc
        soft = 1.0 / (1.0 + jnp.exp(combined))
        if early_exit:  # frozen hard decisions emitted as 0/1 probabilities
            soft = jnp.where(conv, frozen[c : c + 1, :], soft)
        soft_ref[c : c + 1, :] = soft
    if conv_out:
        it = jnp.where(conv, conv_buf[0:1, :], jnp.float32(T))
        conv_ref[:] = jnp.broadcast_to(it, conv_ref.shape)


def make_fused_corrected_gnn_decoder(
    qc: QCLayout,
    params,
    num_iterations: int = 5,
    hidden_dim: int = 64,
    share_layers: bool = False,
    input_injection: bool = True,
    early_exit: bool = False,
    return_iterations: bool = False,
    interpret: bool = False,
):
    """Serving kernel for the flagship corrected decoder: min-sum half-updates
    plus trained GNN corrections, fully VMEM-resident.

    ``params`` from a ``MessageGNNDecoder(var_mode=check_mode="corrected",
    depth_L=0, damping=1.0)`` (see ``create_corrected_minsum_gnn_decoder``).
    Returns ``decode(llr) -> soft bits`` matching ``model.apply``.

    ``early_exit=True``: per-iteration syndrome tracking with first-valid
    freezing (the fused min-sum kernel's rule) — each batch tile's
    ``while_loop`` stops once every frame has a valid syndrome, and frozen
    frames emit their recorded decisions as 0/1 probabilities.  This is
    genie-free syndrome stopping, a *documented deviation* from the
    fixed-``T`` module semantics (``model.apply`` never freezes): outputs
    can differ on frames that reach a valid codeword and later drift.
    Requires the packed lane layout with a power-of-two Z (Z | 128).

    ``return_iterations=True`` (requires ``early_exit``): ``decode`` returns
    ``(soft, conv_iter)`` — per-frame first-valid-syndrome iteration
    (1-based; ``num_iterations`` for frames that never converged), the
    avg-iterations statistic the classical decoders report.
    """
    st = _GNNStructure(qc)
    Z, C, K, h = st.Z, st.C, st.K, hidden_dim
    n = C * Z
    T = num_iterations
    if h % 8:
        raise ValueError(f"hidden_dim must be a multiple of 8, got {h}")
    if 128 % Z == 0:
        Bt, lanes = 128 // Z, 128
    elif Z % 8 == 0:
        Bt, lanes = 1, -(-Z // 128) * 128
    else:
        raise ValueError(f"corrected GNN kernel requires Z % 8 == 0 or Z | 128, got Z={Z}")
    if early_exit and (lanes != Z * Bt or Z & (Z - 1)):
        raise ValueError(
            f"early_exit needs the packed lane layout with power-of-two Z "
            f"(Z | 128); got Z={Z}"
        )
    if return_iterations and not early_exit:
        raise ValueError("return_iterations requires early_exit=True")
    need = gnn_vmem_bytes(qc, h, lanes, input_injection) + 3 * K * lanes * 4
    if need > _VMEM_BUDGET:
        raise ValueError(
            f"corrected GNN state ({need / 2**20:.1f} MiB) exceeds the "
            f"~{_VMEM_BUDGET / 2**20:.0f} MiB VMEM budget (Z={Z}, h={h})"
        )

    w = _extract_corrected(params, qc, T, h, share_layers, input_injection)
    h_in = w["h_in"]
    T2 = 2 * T
    Kpad = -(-K // 128) * 128
    hpad = -(-h_in // 128) * 128

    def stack(x, pad_to):
        T_, hh, d = x.shape
        out = np.zeros((T_ * hh, pad_to), x.dtype)
        out[:, :d] = x.reshape(T_ * hh, d)
        return out

    w1v = jnp.asarray(stack(w["W1v"], hpad), jnp.bfloat16)
    w1c = jnp.asarray(stack(w["W1c"], hpad), jnp.bfloat16)
    w2v = jnp.asarray(stack(w["W2v"], max(128, h)), jnp.bfloat16)
    w2c = jnp.asarray(stack(w["W2c"], max(128, h)), jnp.bfloat16)
    b1v = jnp.asarray(stack(w["bias1v"], Kpad), jnp.float32)
    b1c = jnp.asarray(stack(w["bias1c"], Kpad), jnp.float32)
    b2v = jnp.asarray(np.repeat(w["b2v"].reshape(T2 * h, 1), 128, 1), jnp.float32)
    b2c = jnp.asarray(np.repeat(w["b2c"].reshape(T2 * h, 1), 128, 1), jnp.float32)
    emb = np.zeros((2 * h, 128), np.float32)
    emb[0:h, :] = w["emb_w"][:, None]
    emb[h : 2 * h, :] = w["emb_b"][:, None]
    emb = jnp.asarray(emb)
    # proj stack: T2 weight columns then T2 bias rows
    proj = np.zeros((T2 * h + T2, 128), np.float32)
    proj[: T2 * h, :] = np.repeat(w["proj_w"].reshape(T2 * h, 1), 128, 1)
    for i in range(T2):
        proj[T2 * h + i, :] = w["proj_b"][i]
    proj = jnp.asarray(proj)

    kernel = functools.partial(
        _corrected_kernel, st=st, h=h, T=T, Bt=Bt, lanes=lanes,
        inject=input_injection, w_ch=w["w_ch"], alpha=w["alpha"],
        early_exit=early_exit, conv_out=return_iterations,
    )
    vm = pltpu.VMEM
    weights = (w1v, w2v, w1c, w2c, b1v, b1c, b2v, b2c, emb, proj)
    wspecs = [
        pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=vm) for x in weights
    ]

    # Per-tile row block padded to a sublane multiple: Mosaic requires the
    # non-final block rows divisible by 8 (C=52 is not), so each tile holds
    # Cp rows, the last Cp - C zero/ignored.
    Cp = -(-C // 8) * 8

    @jax.jit
    def decode(llr: Array) -> Array:
        B = llr.shape[0]
        if B % Bt:
            pad = Bt - B % Bt
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        nt = Bp // Bt
        g = llr.reshape(nt, Bt, C, Z).transpose(0, 2, 3, 1).reshape(nt, C, Z * Bt)
        g = jnp.pad(g, ((0, 0), (0, Cp - C), (0, lanes - Z * Bt))).reshape(
            nt * Cp, lanes
        )
        tile_spec = pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm)
        out_specs = [tile_spec]
        out_shape = [jax.ShapeDtypeStruct((nt * Cp, lanes), jnp.float32)]
        if return_iterations:
            out_specs.append(
                pl.BlockSpec((8, lanes), lambda i: (i, 0), memory_space=vm)
            )
            out_shape.append(jax.ShapeDtypeStruct((nt * 8, lanes), jnp.float32))
        out = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[tile_spec] + wspecs,
            out_specs=out_specs if return_iterations else out_specs[0],
            out_shape=out_shape if return_iterations else out_shape[0],
            scratch_shapes=[
                pltpu.VMEM((K, lanes), jnp.float32),  # v2c
                pltpu.VMEM((K, lanes), jnp.float32),  # c2v
                pltpu.VMEM((K, lanes), jnp.float32),  # edge llr
                pltpu.VMEM((K * h, lanes), jnp.bfloat16),  # layer feats
                pltpu.VMEM((C * h if input_injection else 8, lanes), jnp.bfloat16),
                pltpu.VMEM((C * h, lanes), jnp.bfloat16),  # var-relation means
                pltpu.VMEM((st.R * h, lanes), jnp.bfloat16),  # check-relation means
                pltpu.VMEM(((2 if input_injection else 1) * C * h, lanes),
                           jnp.float32),  # per-column first-layer precompute
                pltpu.VMEM((st.R * h, lanes), jnp.float32),  # per-row precompute
                pltpu.VMEM((C, lanes), jnp.float32),  # f32 colsum (exact min-sum)
                pltpu.VMEM((C, lanes), jnp.float32),  # frozen bits (early exit)
                pltpu.VMEM((8, lanes), jnp.float32),  # conv iter (early exit)
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(g, *weights)
        soft = out[0] if return_iterations else out
        soft = (
            soft.reshape(nt, Cp, lanes)[:, :C, : Z * Bt]
            .reshape(nt, C, Z, Bt)
            .transpose(0, 3, 1, 2)
            .reshape(Bp, n)
        )
        if return_iterations:
            # all Z lanes of a frame hold the same value; take z = 0
            conv = out[1].reshape(nt, 8, lanes)[:, 0, :Bt].reshape(Bp)
            return soft[:B], conv[:B]
        return soft[:B]

    return decode


# ---------------------------------------------------------------------------
# Corrected-mode serving kernel v2: element-count reduction (VERDICT r2 #7)
# ---------------------------------------------------------------------------
#
# Applies the v3 fully-neural-kernel diet to the flagship corrected
# decoder's GNN-correction halves, plus one structural collapse unique to
# this decoder: the correction consumes the GNN layer output ONLY through
# the scalar projection `corr = pw^T (W2v h1v + W2c h1c + b2) + pb`, which
# is linear — so the entire second MLP layer + projection fold into a
# single thin row-matmul `(pw^T [W2v W2c]) @ h1` with the constant
# `pw^T b2 + pb` riding the h1 ones-row.  The kernel never materializes
# the (h, lanes) layer output and never does per-edge h-reductions.
# Remaining per-edge element work per correction: embed 2, var-mean 2,
# projected-roll accumulate 2, pv 3, pc 4-5 — ~14 (h, lanes) blocks vs
# ~24 in the v1 corrected kernel.  Type embeddings enter through the
# per-edge embedding bias (embed is per-edge already, so te is FREE here).


def _extract_corrected_v2(params, qc: QCLayout, num_iterations: int,
                          hidden_dim: int, share_layers: bool,
                          input_injection: bool):
    """Params -> v2 tables: raw W1 blocks, per-edge embed bias (emb_b + te),
    folded thin second layer.  Layer idx = 2*t (check half), 2*t+1 (var)."""
    p = params["params"] if "params" in params else params
    h = hidden_dim
    T = num_iterations
    K = qc.num_base_edges

    emb_w = np.asarray(p["input_embedding"]["kernel"], np.float32).reshape(h)
    emb_b = np.asarray(p["input_embedding"]["bias"], np.float32).reshape(h)
    w_ch = float(np.asarray(p["w_ch"]).reshape(()))
    alpha = float(np.asarray(p["alpha"]).reshape(()))

    T2 = 2 * T
    W1vf = np.zeros((T2, h, h), np.float32)
    W1cf = np.zeros((T2, h, h), np.float32)
    W1va = np.zeros((T2, h, h), np.float32)
    W1ca = np.zeros((T2, h, h), np.float32)
    W1vl = np.zeros((T2, h, h), np.float32)
    W1cl = np.zeros((T2, h, h), np.float32)
    b1v = np.zeros((T2, h), np.float32)
    b1c = np.zeros((T2, h), np.float32)
    w2p = np.zeros((T2, 2 * h), np.float32)  # pw^T [W2v W2c]
    cconst = np.zeros((T2,), np.float32)  # pw . (b2v + b2c) + pb
    ebias = np.zeros((T2, h, K), np.float32)  # emb_b + te per edge

    for t in range(T):
        for half, prefix in ((0, "check"), (1, "var")):
            name = prefix if share_layers else f"{prefix}_{t}"
            lp = p[f"{name}_gnn"]
            pr = p[f"{name}_proj"]
            idx = 2 * t + half
            pw = np.asarray(pr["kernel"], np.float32).reshape(h)
            pb = float(np.asarray(pr["bias"]).reshape(()))
            te = np.asarray(lp["message_type_embeddings"], np.float32)
            ebias[idx] = emb_b[:, None] + te[np.asarray(qc.edge_type)].T
            b2sum = np.zeros(h, np.float32)
            for rel, W1f, W1a, W1l, bb1, w2half in (
                ("var_to_check_update", W1vf, W1va, W1vl, b1v, slice(0, h)),
                ("check_to_var_update", W1cf, W1ca, W1cl, b1c, slice(h, 2 * h)),
            ):
                k1 = np.asarray(lp[rel]["Dense_0"]["kernel"], np.float32)
                W1f[idx] = k1[0:h].T
                W1a[idx] = k1[h : 2 * h].T
                if input_injection:
                    W1l[idx] = k1[2 * h : 3 * h].T
                bb1[idx] = np.asarray(lp[rel]["Dense_0"]["bias"], np.float32)
                k2 = np.asarray(lp[rel]["Dense_1"]["kernel"], np.float32)  # (h, h)
                w2p[idx, w2half] = pw @ k2.T
                b2sum += np.asarray(lp[rel]["Dense_1"]["bias"], np.float32)
            cconst[idx] = float(pw @ b2sum) + pb

    return dict(
        emb_w=emb_w, emb_b=emb_b, w_ch=w_ch, alpha=alpha,
        W1vf=W1vf, W1cf=W1cf, W1va=W1va, W1ca=W1ca, W1vl=W1vl, W1cl=W1cl,
        b1v=b1v, b1c=b1c, w2p=w2p, cconst=cconst, ebias=ebias,
    )


def _corrected_kernel_v2(llr_ref, w1g_ref, w1va_ref, w1l_ref, w2p_ref,
                         pcb_ref, prb_ref, ebias_ref, emb_ref, soft_ref,
                         *rest, st, h: int, T: int, Bt: int, lanes: int,
                         inject: bool, w_ch: float, alpha: float,
                         early_exit: bool = False, conv_out: bool = False):
    if conv_out:
        conv_ref, *rest = rest
    (v2c, c2v, edge_llr, feats, llr_feats, var_mean, gall, h1,
     pre_col, pre_row, pre_llr, colsum, frozen, conv_buf) = rest
    Z, K, C, R = st.Z, st.K, st.C, st.R
    packed = Bt > 1
    f32 = jnp.float32
    bf16 = jnp.bfloat16

    def roll_f32(x, s):
        if packed:
            s = (s % Z) * Bt
            return pltpu.roll(x, s, 1) if s else x
        return _roll_lanes(x, s, Z)

    def lb(k):
        return pl.ds(k * lanes, lanes)

    emb_w = emb_ref[0:h, 0:1]
    emb_b = emb_ref[h : 2 * h, 0:1]

    # ---- seed ------------------------------------------------------------
    for c in range(C):
        row = llr_ref[c : c + 1, :]
        if inject:
            llr_feats[:, lb(c)] = (
                jnp.broadcast_to(row, (h, lanes)) * emb_w + emb_b
            ).astype(bf16)
        for k in st.col_members[c]:
            edge_llr[k : k + 1, :] = row
            v2c[k : k + 1, :] = row
            c2v[k : k + 1, :] = jnp.zeros((1, lanes), f32)
    h1[pl.ds(2 * h, 8), :] = jnp.concatenate(
        [jnp.ones((1, K * lanes), bf16), jnp.zeros((7, K * lanes), bf16)], axis=0
    )

    inv_dc = [1.0 / max(len(st.col_members[c]), 1) for c in range(C)]

    if early_exit:
        frozen[:] = jnp.zeros_like(frozen)
        conv_buf[:] = jnp.zeros_like(conv_buf)

    def gnn_correction(idx, msgs, out_msgs):
        """out_msgs[k] += pw^T GNNLayer_idx(embed(msgs))[k]  for every edge."""
        ih = pl.ds(idx * h, h)
        i2h = pl.ds(idx * 2 * h, 2 * h)
        i3h = pl.ds(idx * 3 * h, 3 * h)
        # embed with the per-edge bias (emb_b + te): te costs nothing here
        for k in range(K):
            feats[:, lb(k)] = (
                jnp.broadcast_to(msgs[k : k + 1, :], (h, lanes)) * emb_w
                + ebias_ref[ih, k : k + 1]
            ).astype(bf16)
        for c in range(C):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + feats[:, lb(k)].astype(f32)
            var_mean[:, lb(c)] = (acc * inv_dc[c]).astype(bf16)
        gall[:, :] = jnp.dot(w1g_ref[i3h, 0:h], feats[:, :],
                             preferred_element_type=f32)
        for r in range(R):
            acc = jnp.zeros((h, lanes), f32)
            for k in st.row_members[r]:
                acc = acc + roll_f32(gall[pl.ds(2 * h, h), lb(k)], -st.shifts[k])
            pre_row[:, lb(r)] = acc * (
                1.0 / max(len(st.row_members[r]), 1)
            ) + jnp.broadcast_to(prb_ref[ih, r : r + 1], (h, lanes))
        pre_col[:, :] = jnp.dot(w1va_ref[ih, 0:h], var_mean[:, :],
                                preferred_element_type=f32)
        if inject:
            pre_llr[:, :] = jnp.dot(w1l_ref[i2h, 0:h], llr_feats[:, :],
                                    preferred_element_type=f32)
        for c in range(C):
            pc = pre_col[:, lb(c)] + jnp.broadcast_to(
                pcb_ref[ih, c : c + 1], (h, lanes)
            )
            if inject:
                pc = pc + pre_llr[0:h, lb(c)]
            pre_col[:, lb(c)] = pc
        for k in range(K):
            c_k, r_k = st.cols[k], st.rows[k]
            pv = gall[0:h, lb(k)] + pre_col[:, lb(c_k)]
            h1[0:h, lb(k)] = jnp.maximum(pv, 0.0).astype(bf16)
            pc = (gall[pl.ds(h, h), lb(k)]
                  + roll_f32(pre_row[:, lb(r_k)], st.shifts[k]))
            if inject:
                pc = pc + pre_llr[pl.ds(h, h), lb(c_k)]
            h1[pl.ds(h, h), lb(k)] = jnp.maximum(pc, 0.0).astype(bf16)
        # thin folded second layer + projection (constant in the ones-row)
        corr = jnp.dot(w2p_ref[pl.ds(idx * 8, 8), 0 : 2 * h + 8], h1[:, :],
                       preferred_element_type=f32)
        for k in range(K):
            out_msgs[k : k + 1, :] = (
                out_msgs[k : k + 1, :] + corr[0:1, k * lanes : (k + 1) * lanes]
            )

    def iteration(t, _):
        # ---- check half: scaled min-sum + GNN correction -------------------
        for r in range(R):
            members = st.row_members[r]
            rolled = []
            m1 = jnp.full((1, lanes), _BIG, f32)
            m2 = jnp.full((1, lanes), _BIG, f32)
            sp = jnp.ones((1, lanes), f32)
            for k in members:
                x = roll_f32(v2c[k : k + 1, :], -st.shifts[k])
                rolled.append(x)
                sgn = jnp.where(x < 0, -1.0, 1.0)
                mag = jnp.abs(x)
                sp = sp * sgn
                nm = jnp.minimum(mag, m1)
                m2 = jnp.minimum(jnp.maximum(mag, m1), m2)
                m1 = nm
            for k, x in zip(members, rolled):
                sgn = jnp.where(x < 0, -1.0, 1.0)
                mag = jnp.abs(x)
                loo = jnp.where(mag > m1, m1, m2)
                loo = jnp.where(loo < _BIG, loo, 0.0)
                c2v[k : k + 1, :] = roll_f32(alpha * sp * sgn * loo, st.shifts[k])
        gnn_correction(2 * t, v2c, c2v)

        # ---- var half: leave-one-out sum + GNN correction ------------------
        for c in range(C):
            acc = jnp.zeros((1, lanes), f32)
            for k in st.col_members[c]:
                acc = acc + c2v[k : k + 1, :]
            colsum[c : c + 1, :] = acc
        for k in range(K):
            loo = colsum[st.cols[k] : st.cols[k] + 1, :] - c2v[k : k + 1, :]
            v2c[k : k + 1, :] = loo + w_ch * edge_llr[k : k + 1, :]
        gnn_correction(2 * t + 1, c2v, v2c)

        # ---- syndrome tracking + first-valid freezing (early exit) --------
        if early_exit:
            bits_now = [
                jnp.where(llr_ref[c : c + 1, :] + colsum[c : c + 1, :] < 0.0,
                          1.0, 0.0)
                for c in range(C)
            ]
            viol = jnp.zeros((1, lanes), f32)
            for r in range(R):
                parity = jnp.zeros((1, lanes), f32)
                for k in st.row_members[r]:
                    parity = parity + roll_f32(bits_now[st.cols[k]], -st.shifts[k])
                parity = parity - 2.0 * jnp.floor(parity * 0.5)
                viol = viol + parity
            s = Bt
            while s < Z * Bt:
                viol = viol + pltpu.roll(viol, s, 1)
                s *= 2
            ok = viol == 0.0
            newly = jnp.logical_and(ok, conv_buf[0:1, :] == 0.0)
            for c in range(C):
                frozen[c : c + 1, :] = jnp.where(newly, bits_now[c],
                                                 frozen[c : c + 1, :])
            conv_buf[0:1, :] = jnp.where(newly, jnp.float32(t) + 1.0,
                                         conv_buf[0:1, :])
        return 0

    _run_iterations(iteration, T, early_exit,
                    lambda: jnp.min(conv_buf[0:1, :]) > 0.0)

    # ---- output: llr + colsum -> soft bits --------------------------------
    # colsum still holds the last iteration's per-column c2v sums (only v2c
    # is written after the var-half colsum pass), so the output stage reads
    # it instead of re-accumulating c2v — C x degree fewer VPU adds.
    if early_exit:
        conv = conv_buf[0:1, :] > 0.0
    for c in range(C):
        combined = llr_ref[c : c + 1, :] + colsum[c : c + 1, :]
        soft = 1.0 / (1.0 + jnp.exp(combined))
        if early_exit:
            soft = jnp.where(conv, frozen[c : c + 1, :], soft)
        soft_ref[c : c + 1, :] = soft
    if conv_out:
        it = jnp.where(conv, conv_buf[0:1, :], jnp.float32(T))
        conv_ref[:] = jnp.broadcast_to(it, conv_ref.shape)


def corrected_v2_vmem_bytes(qc: QCLayout, hidden_dim: int, lanes: int,
                            input_injection: bool) -> int:
    K, C, R = qc.num_base_edges, qc.num_base_cols, qc.num_base_rows
    h = hidden_dim
    bf16 = (K + (C if input_injection else 0) + C) * h * lanes * 2
    bf16 += (2 * h + 8) * K * lanes * 2  # h1
    f32 = 3 * K * h * lanes * 4  # gall
    f32 += (C + R + (2 * C if input_injection else 0)) * h * lanes * 4
    f32 += 3 * K * lanes * 4 + 2 * C * lanes * 4  # messages + colsum/frozen
    return bf16 + f32


def make_fused_corrected_gnn_decoder_v2(
    qc: QCLayout,
    params,
    num_iterations: int = 5,
    hidden_dim: int = 64,
    share_layers: bool = False,
    input_injection: bool = True,
    early_exit: bool = False,
    return_iterations: bool = False,
    interpret: bool = False,
):
    """Element-count-reduced serving kernel for the flagship corrected
    decoder (same semantics/flags as :func:`make_fused_corrected_gnn_decoder`;
    see the design comment above `_extract_corrected_v2`)."""
    st = _GNNStructure(qc)
    Z, C, K, h = st.Z, st.C, st.K, hidden_dim
    n = C * Z
    T = num_iterations
    if h % 8:
        raise ValueError(f"hidden_dim must be a multiple of 8, got {h}")
    if 128 % Z == 0:
        Bt, lanes = 128 // Z, 128
    elif Z % 8 == 0:
        Bt, lanes = 1, -(-Z // 128) * 128
    else:
        raise ValueError(f"corrected GNN kernel requires Z % 8 == 0 or Z | 128, got Z={Z}")
    if early_exit and (lanes != Z * Bt or Z & (Z - 1)):
        raise ValueError(
            f"early_exit needs the packed lane layout with power-of-two Z "
            f"(Z | 128); got Z={Z}"
        )
    if return_iterations and not early_exit:
        raise ValueError("return_iterations requires early_exit=True")
    need = corrected_v2_vmem_bytes(qc, h, lanes, input_injection)
    budget = 56 * 2**20
    if need > budget:
        raise ValueError(
            f"corrected v2 state ({need / 2**20:.1f} MiB) exceeds the "
            f"{budget / 2**20:.0f} MiB scratch budget (Z={Z}, h={h})"
        )

    w = _extract_corrected_v2(params, qc, T, h, share_layers, input_injection)
    T2 = 2 * T
    Kpad = -(-K // 128) * 128

    w1g = np.zeros((T2 * 3 * h, 128), np.float32)
    for i in range(T2):
        w1g[i * 3 * h : i * 3 * h + h, :h] = w["W1vf"][i]
        w1g[i * 3 * h + h : i * 3 * h + 2 * h, :h] = w["W1cf"][i]
        w1g[i * 3 * h + 2 * h : (i + 1) * 3 * h, :h] = w["W1ca"][i]
    w1g = jnp.asarray(w1g, jnp.bfloat16)

    def stack(x, pad_to):
        T_, hh, d = x.shape
        out = np.zeros((T_ * hh, pad_to), x.dtype)
        out[:, :d] = x.reshape(T_ * hh, d)
        return out

    w1va = jnp.asarray(stack(w["W1va"], 128), jnp.bfloat16)
    w1l = np.zeros((T2 * 2 * h, 128), np.float32)
    if input_injection:
        for i in range(T2):
            w1l[i * 2 * h : i * 2 * h + h, :h] = w["W1vl"][i]
            w1l[i * 2 * h + h : (i + 1) * 2 * h, :h] = w["W1cl"][i]
    w1l = jnp.asarray(w1l, jnp.bfloat16)
    # thin folded second layer: 8 sublane rows per idx (row 0 live), with
    # the constant in the ones-row column 2h
    w2p = np.zeros((T2 * 8, max(2 * h + 8, 128)), np.float32)
    for i in range(T2):
        w2p[i * 8, 0 : 2 * h] = w["w2p"][i]
        w2p[i * 8, 2 * h] = w["cconst"][i]
    w2p = jnp.asarray(w2p, jnp.bfloat16)
    pcb = jnp.asarray(np.repeat(w["b1v"].reshape(T2 * h, 1), 128, 1), jnp.float32)
    prb = jnp.asarray(np.repeat(w["b1c"].reshape(T2 * h, 1), 128, 1), jnp.float32)
    ebias = jnp.asarray(
        np.concatenate(
            [np.pad(w["ebias"][i], ((0, 0), (0, Kpad - K))) for i in range(T2)],
            axis=0,
        ),
        jnp.float32,
    )
    emb = np.zeros((2 * h, 128), np.float32)
    emb[0:h, :] = w["emb_w"][:, None]
    emb[h : 2 * h, :] = w["emb_b"][:, None]
    emb = jnp.asarray(emb)

    kernel = functools.partial(
        _corrected_kernel_v2, st=st, h=h, T=T, Bt=Bt, lanes=lanes,
        inject=input_injection, w_ch=w["w_ch"], alpha=w["alpha"],
        early_exit=early_exit, conv_out=return_iterations,
    )
    vm = pltpu.VMEM
    weights = (w1g, w1va, w1l, w2p, pcb, prb, ebias, emb)
    wspecs = [
        pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=vm) for x in weights
    ]
    Cp = -(-C // 8) * 8

    @jax.jit
    def decode(llr: Array) -> Array:
        B = llr.shape[0]
        if B % Bt:
            pad = Bt - B % Bt
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        nt = Bp // Bt
        g = llr.reshape(nt, Bt, C, Z).transpose(0, 2, 3, 1).reshape(nt, C, Z * Bt)
        g = jnp.pad(g, ((0, 0), (0, Cp - C), (0, lanes - Z * Bt))).reshape(
            nt * Cp, lanes
        )
        tile_spec = pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm)
        out_specs = [tile_spec]
        out_shape = [jax.ShapeDtypeStruct((nt * Cp, lanes), jnp.float32)]
        if return_iterations:
            out_specs.append(
                pl.BlockSpec((8, lanes), lambda i: (i, 0), memory_space=vm)
            )
            out_shape.append(jax.ShapeDtypeStruct((nt * 8, lanes), jnp.float32))
        out = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[tile_spec] + wspecs,
            out_specs=out_specs if return_iterations else out_specs[0],
            out_shape=out_shape if return_iterations else out_shape[0],
            scratch_shapes=[
                pltpu.VMEM((K, lanes), jnp.float32),  # v2c
                pltpu.VMEM((K, lanes), jnp.float32),  # c2v
                pltpu.VMEM((K, lanes), jnp.float32),  # edge llr
                pltpu.VMEM((h, K * lanes), jnp.bfloat16),  # embedded feats
                pltpu.VMEM((h, (C if input_injection else 1) * lanes),
                           jnp.bfloat16),  # llr feats
                pltpu.VMEM((h, C * lanes), jnp.bfloat16),  # var-relation means
                pltpu.VMEM((3 * h, K * lanes), jnp.float32),  # first-layer out
                pltpu.VMEM((2 * h + 8, K * lanes), jnp.bfloat16),  # h1 (+ones)
                pltpu.VMEM((h, C * lanes), jnp.float32),  # pre_col
                pltpu.VMEM((h, st.R * lanes), jnp.float32),  # pre_row
                pltpu.VMEM((2 * h, (C if input_injection else 1) * lanes),
                           jnp.float32),  # per-column LLR precompute
                pltpu.VMEM((C, lanes), jnp.float32),  # f32 colsum
                pltpu.VMEM((C, lanes), jnp.float32),  # frozen bits
                pltpu.VMEM((8, lanes), jnp.float32),  # conv iter
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(g, *weights)
        soft = out[0] if return_iterations else out
        soft = (
            soft.reshape(nt, Cp, lanes)[:, :C, : Z * Bt]
            .reshape(nt, C, Z, Bt)
            .transpose(0, 3, 1, 2)
            .reshape(Bp, n)
        )
        if return_iterations:
            conv = out[1].reshape(nt, 8, lanes)[:, 0, :Bt].reshape(Bp)
            return soft[:B], conv[:B]
        return soft[:B]

    return decode


def make_fused_gnn_decoder(
    qc: QCLayout,
    params,
    num_iterations: int = 5,
    hidden_dim: int = 64,
    share_layers: bool = False,
    input_injection: bool = False,
    interpret: bool = False,
):
    """Build the fused inference decoder: (B, n) LLRs -> (B, n) soft bits.

    ``params`` is the trained Flax param tree of a fully-neural
    :class:`MessageGNNDecoder` with matching hyperparameters.
    """
    st = _GNNStructure(qc)
    Z, C, K, h = st.Z, st.C, st.K, hidden_dim
    n = C * Z
    T = num_iterations
    if h % 8:
        raise ValueError(f"hidden_dim must be a multiple of 8, got {h}")
    if 128 % Z == 0:
        Bt, lanes, packed = 128 // Z, 128, True
    elif Z % 8 == 0:
        Bt, lanes, packed = 1, -(-Z // 128) * 128, False
    else:
        raise ValueError(f"fused GNN kernel requires Z % 8 == 0 or Z | 128, got Z={Z}")
    need = gnn_vmem_bytes(qc, h, lanes, input_injection)
    if need > _VMEM_BUDGET:
        raise ValueError(
            f"fused GNN state ({need / 2**20:.1f} MiB) exceeds the "
            f"~{_VMEM_BUDGET / 2**20:.0f} MiB VMEM budget (Z={Z}, h={h})"
        )

    w = _extract(params, qc, T, h, share_layers, input_injection)
    h_in = w["h_in"]
    Kpad = -(-K // 128) * 128
    hpad = -(-h_in // 128) * 128

    def stack(x, pad_to):  # (T, h, d) -> (T*h, pad_to)
        T_, hh, d = x.shape
        out = np.zeros((T_ * hh, pad_to), x.dtype)
        out[:, :d] = x.reshape(T_ * hh, d)
        return out

    w1v = jnp.asarray(stack(w["W1v"], hpad), jnp.bfloat16)
    w1c = jnp.asarray(stack(w["W1c"], hpad), jnp.bfloat16)
    w2v = jnp.asarray(stack(w["W2v"], 128 if h <= 128 else h), jnp.bfloat16)
    w2c = jnp.asarray(stack(w["W2c"], 128 if h <= 128 else h), jnp.bfloat16)
    b1v = jnp.asarray(stack(w["bias1v"], Kpad), jnp.float32)
    b1c = jnp.asarray(stack(w["bias1c"], Kpad), jnp.float32)
    b2v = jnp.asarray(np.repeat(w["b2v"].reshape(T * h, 1), 128, 1), jnp.float32)
    b2c = jnp.asarray(np.repeat(w["b2c"].reshape(T * h, 1), 128, 1), jnp.float32)
    emb = np.zeros((3 * h + 8, 128), np.float32)
    emb[0:h, :] = w["emb_w"][:, None]
    emb[h : 2 * h, :] = w["emb_b"][:, None]
    emb[2 * h : 3 * h, :] = w["proj_w"][:, None]
    emb[3 * h, :] = w["proj_b"]
    emb = jnp.asarray(emb)

    kernel = functools.partial(
        _kernel, st=st, h=h, T=T, Bt=Bt, lanes=lanes, inject=input_injection,
    )
    vm = pltpu.VMEM
    weights = (w1v, w2v, w1c, w2c, b1v, b1c, b2v, b2c, emb)
    wspecs = [
        pl.BlockSpec(x.shape, lambda i: (0, 0), memory_space=vm) for x in weights
    ]

    Cp = -(-C // 8) * 8  # see make_fused_corrected_gnn_decoder: 8-sublane blocks

    @jax.jit
    def decode(llr: Array) -> Array:
        B = llr.shape[0]
        if B % Bt:
            pad = Bt - B % Bt
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        nt = Bp // Bt
        # z-major lanes: lane = z * Bt + b
        g = llr.reshape(nt, Bt, C, Z).transpose(0, 2, 3, 1).reshape(nt, C, Z * Bt)
        g = jnp.pad(g, ((0, 0), (0, Cp - C), (0, lanes - Z * Bt))).reshape(
            nt * Cp, lanes
        )
        soft = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm)]
            + wspecs,
            out_specs=pl.BlockSpec((Cp, lanes), lambda i: (i, 0), memory_space=vm),
            out_shape=jax.ShapeDtypeStruct((nt * Cp, lanes), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((K * h, lanes), jnp.bfloat16),  # feats
                pltpu.VMEM((C * h if input_injection else 8, lanes), jnp.bfloat16),
                pltpu.VMEM((C * h, lanes), jnp.bfloat16),  # var-relation means
                pltpu.VMEM((st.R * h, lanes), jnp.bfloat16),  # check-relation means
                pltpu.VMEM(((2 if input_injection else 1) * C * h, lanes),
                           jnp.float32),  # per-column first-layer precompute
                pltpu.VMEM((st.R * h, lanes), jnp.float32),  # per-row precompute
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(g, *weights)
        soft = (
            soft.reshape(nt, Cp, lanes)[:, :C, : Z * Bt]
            .reshape(nt, C, Z, Bt)
            .transpose(0, 3, 1, 2)
            .reshape(Bp, n)
        )
        return soft[:B]

    return decode
