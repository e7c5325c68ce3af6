"""Fused Pallas inference kernel for trained neural min-sum decoders.

Serving path: a trained :class:`~ldpc_tpu.models.neural_min_sum.
NeuralMinSumDecoder` is a classical min-sum loop plus per-edge channel
weights, residual taps, and alpha/offset corrections — all *constants* at
inference time.  This kernel runs the same VMEM-resident decode loop as
:mod:`ldpc_tpu.ops.pallas_minsum` with those weights applied, so a trained
model decodes at Gbit/s-class throughput instead of the XLA scan path.

Weight plumbing (uniform for shared and per-iteration weights):

* per-edge channel weights -> a ``(T*Z, K)`` VMEM input, sliced
  ``[t*Z : (t+1)*Z, k]`` per edge per iteration;
* alpha / offset / residual taps -> small SMEM arrays indexed by the
  iteration counter inside a ``fori_loop`` (the loop body is traced once —
  a fully unrolled variant blows past the Mosaic stack allocator).

The residual FIFO's newest slot doubles as the v2c message buffer (q), so
depth-2 models fit the 16 MB VMEM at the full 128-lane batch tile.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.codes.edge_layout import QCLayout
from ldpc_tpu.ops.pallas_minsum import _BIG, _roll, _structure

Array = jax.Array


def _pack_weights(qc: QCLayout, params, num_iterations: int, depth_L: int,
                  per_iteration: bool):
    """Flax params -> dense per-iteration arrays.

    Returns (w_cols (T*Z, K), w_res (T, max(L,1)), alpha (T,), offset (T,)).
    """
    p = params["params"] if "params" in params else params
    K, Z = qc.num_base_edges, qc.Z
    T = num_iterations

    def expand_edge(w):
        """One iteration's channel weights -> (K, Z)."""
        w = np.asarray(w, np.float32)
        if w.shape == (K, Z):
            return w
        if w.shape == (K,):
            return np.repeat(w[:, None], Z, axis=1)
        if w.ndim == 1:  # per shift type
            return np.repeat(w[qc.edge_type][:, None], Z, axis=1)
        if w.ndim == 0:
            return np.full((K, Z), float(w), np.float32)
        raise ValueError(f"unsupported w_ch shape {w.shape}")

    def per_t(name, default):
        x = np.asarray(p.get(name, default), np.float32)
        if per_iteration and x.ndim >= 1 and x.shape[0] == T:
            return [x[t] for t in range(T)]
        return [x] * T

    w_ch_t = per_t("w_ch", 1.0)
    w_res_t = per_t("w_res", np.zeros((depth_L,), np.float32))
    alpha_t = per_t("alpha", 1.0)
    offset_t = per_t("offset", 0.0)

    w_full = np.stack([expand_edge(w) for w in w_ch_t])  # (T, K, Z)
    # Rows padded to the 8-sublane granule so per-iteration dynamic offsets
    # (t * Zp) stay aligned; shared weights collapse to one (Zp, K) block.
    Zp = ((Z + 7) // 8) * 8
    T_eff = T if per_iteration else 1
    w_cols = np.zeros((T_eff * Zp, K), np.float32)
    for t in range(T_eff):
        w_cols[t * Zp : t * Zp + Z] = w_full[t].T
    L = max(depth_L, 1)
    w_res = np.zeros((T, L), np.float32)
    for t in range(T):
        r = np.atleast_1d(w_res_t[t])
        w_res[t, : min(r.shape[0], L)] = r[:L]
    alpha = np.array([float(a) for a in alpha_t], np.float32)
    offset = np.array([float(o) for o in offset_t], np.float32)
    return w_cols, w_res, alpha, offset


def make_fused_neural_minsum(
    qc: QCLayout,
    params,
    num_iterations: int = 5,
    depth_L: int = 2,
    batch_tile: int = 128,
    interpret: bool = False,
    per_iteration: bool = False,
):
    """Build a fused inference decoder for a trained NeuralMinSumDecoder.

    (B, n) LLRs -> (B, n) hard bits.  Output semantics follow
    ``output_mode="sum_plus_input"``.
    """
    st = _structure(qc)
    Z, C, K = st.Z, st.C, st.K
    n = C * Z
    T = num_iterations
    w_cols, w_res_arr, alpha_arr, offset_arr = _pack_weights(
        qc, params, T, depth_L, per_iteration
    )
    L = w_res_arr.shape[1]
    Zp = ((Z + 7) // 8) * 8

    def kernel(llr_ref, w_ref, alpha_ref, offset_ref, wres_ref, bits_ref, c2v, *fifo_and_q):
        # q aliases fifo[0]: the newest residual slot IS the current v2c.
        q = fifo_and_q[0]
        fifo = list(fifo_and_q) if depth_L else []
        Bt = llr_ref.shape[1]

        def ez(k):
            return slice(k * Z, (k + 1) * Z)

        c2v[:] = jnp.zeros_like(c2v)
        for f in fifo[1:]:
            f[:] = jnp.zeros_like(f)
        for k in range(K):
            q[ez(k)] = llr_ref[ez(st.cols[k])]

        def body(t, _):
            alpha = alpha_ref[t, 0]
            offset = offset_ref[t, 0]
            # ---- check update from q --------------------------------------
            for r in range(st.R):
                members = st.row_members[r]
                rolled = []
                m1 = jnp.full((Z, Bt), _BIG, jnp.float32)
                m2 = jnp.full((Z, Bt), _BIG, jnp.float32)
                sp = jnp.ones((Z, Bt), jnp.float32)
                for k in members:
                    x = _roll(q[ez(k)], -st.shifts[k], Z)
                    rolled.append(x)
                    sgn = jnp.where(x < 0, -1.0, 1.0)
                    mag = jnp.abs(x)
                    sp = sp * sgn
                    new_min = jnp.minimum(mag, m1)
                    m2 = jnp.minimum(jnp.maximum(mag, m1), m2)
                    m1 = new_min
                for k, x in zip(members, rolled):
                    sgn = jnp.where(x < 0, -1.0, 1.0)
                    mag = jnp.abs(x)
                    loo = jnp.where(mag > m1, m1, m2)
                    loo = jnp.where(loo < _BIG, loo, 0.0)
                    loo = jnp.maximum(loo - offset, 0.0)
                    c2v[ez(k)] = _roll(alpha * sp * sgn * loo, st.shifts[k], Z)

            # ---- neural variable update (skipped after the last check) ----
            @pl.when(t < T - 1)
            def _():
                # fifo[0] aliases q, which at t = 0 still holds the edge-LLR
                # seed, not a previous variable output — the model's FIFO
                # starts at zeros (neural_min_sum.py `fifo0`), so the t = 0
                # taps and the t = 0 shift must see zeros, not the seed.
                live = jnp.where(t > 0, 1.0, 0.0)
                for c in range(C):
                    colsum = jnp.zeros((Z, Bt), jnp.float32)
                    for k in st.col_members[c]:
                        colsum = colsum + c2v[ez(k)]
                    for k in st.col_members[c]:
                        # fifo[0] holds Q_{t-1} (this iteration's check
                        # input), fifo[1] holds Q_{t-2}, ...
                        res = jnp.zeros((Z, Bt), jnp.float32)
                        for l in range(min(depth_L, len(fifo))):
                            res = res + wres_ref[t, l] * fifo[l][ez(k)]
                        if per_iteration:
                            w_term = w_ref[pl.ds(t * Zp, Z), k : k + 1]  # (Z, 1)
                        else:
                            w_term = w_ref[0:Z, k : k + 1]
                        q_new = (colsum - c2v[ez(k)]) + w_term * llr_ref[ez(c)] + live * res
                        for l in range(len(fifo) - 1, 0, -1):
                            fifo[l][ez(k)] = live * fifo[l - 1][ez(k)]
                        q[ez(k)] = q_new

            return 0

        jax.lax.fori_loop(0, T, body, 0, unroll=False)

        # ---- output: llr + colsum(c2v) -> hard bits ------------------------
        for c in range(C):
            colsum = jnp.zeros((Z, Bt), jnp.float32)
            for k in st.col_members[c]:
                colsum = colsum + c2v[ez(k)]
            belief = llr_ref[ez(c)] + colsum
            bits_ref[ez(c)] = jnp.where(belief < 0, 1.0, 0.0)

    @jax.jit
    def decode(llr: Array) -> Array:
        B = llr.shape[0]
        if B % batch_tile:
            pad = batch_tile - B % batch_tile
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        llr_cz = llr.reshape(Bp, C, Z).transpose(1, 2, 0).reshape(C * Z, Bp)
        n_msg_bufs = max(depth_L, 1)
        bits_cz = pl.pallas_call(
            kernel,
            grid=(Bp // batch_tile,),
            in_specs=[
                pl.BlockSpec((C * Z, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(w_cols.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((T, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((T, L), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((C * Z, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((C * Z, Bp), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K * Z, batch_tile), jnp.float32)]
            + [pltpu.VMEM((K * Z, batch_tile), jnp.float32) for _ in range(n_msg_bufs)],
            interpret=interpret,
        )(
            llr_cz,
            jnp.asarray(w_cols),
            jnp.asarray(alpha_arr[:, None]),
            jnp.asarray(offset_arr[:, None]),
            jnp.asarray(w_res_arr),
        )
        bits = bits_cz.reshape(C, Z, Bp).transpose(2, 0, 1).reshape(Bp, n)
        return bits[:B]

    return decode
