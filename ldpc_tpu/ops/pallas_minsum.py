"""Fused Pallas TPU kernel: the entire min-sum decode loop in VMEM.

The XLA decoder (:mod:`ldpc_tpu.models.classical`) round-trips every message
tensor through HBM each iteration.  This kernel instead keeps *all* decode
state — channel LLRs, c2v/v2c messages, beliefs, frozen bits, convergence
iterations — resident in VMEM for a tile of the batch, running all
iterations back-to-back.  HBM traffic collapses to one LLR read and one
bits/iteration write per tile, which is the speed-of-light floor for the op
(BASELINE.json: check/variable kernels HBM-bandwidth-bound).

Structure exploited (this is why no gather appears anywhere):

* Messages live as (Z, Bt) blocks per base edge, batch in the lanes.
* The check<->variable alignment change for base edge k with circulant
  shift s is a roll by s along the Z (sublane) axis — implemented as two
  static slices + concat, which Mosaic compiles to cheap vector shuffles.
* Per-check leave-one-out min-sum uses the running (min, 2nd-min,
  sign-product) reduction over the <=10 member blocks of each base row; the
  excluded minimum for member k is ``m1 if |x_k| > m1 else m2`` (ties fall
  out correctly because then m2 == m1).
* The base-graph loops (42 rows, 52 cols, 197 edges) are unrolled at trace
  time — they are compile-time structure, like the reference's index
  tensors, but with zero runtime indexing cost.

Semantics match :func:`ldpc_tpu.models.classical.decode_min_sum` exactly
(same update order, per-frame first-valid-syndrome freezing); parity is
asserted in tests/test_pallas_minsum.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.codes.edge_layout import QCLayout

Array = jax.Array

_BIG = 1e9

# Budget used by the AUTO backend selection (models/classical.py): the
# sweet spot measured for the default batch_tile, not a hardware bound —
# v5e has 128 MiB VMEM/core and explicit larger tiles are allowed up to
# _VMEM_HARD_CAP (the compiler's scoped-vmem limit is raised to match).
_VMEM_BUDGET = 14 * 2**20
_VMEM_HARD_CAP = 72 * 2**20
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def fused_vmem_bytes(qc: QCLayout, batch_tile: int = 128) -> int:
    """Rough VMEM footprint of the fused decode kernel state."""
    K, Z, C = qc.num_base_edges, qc.Z, qc.num_base_cols
    per_lane = (K * Z + 3 * C * Z + 2 * C * Z) * 4  # c2v + beliefs/frozen/llr + io
    return per_lane * batch_tile


def fused_kernel_fits(qc: QCLayout, batch_tile: int = 128) -> bool:
    return fused_vmem_bytes(qc, batch_tile) <= _VMEM_BUDGET


class _Structure(NamedTuple):
    """Static base-graph structure baked into the kernel trace."""

    Z: int
    R: int
    C: int
    K: int
    row_members: tuple[tuple[int, ...], ...]  # base-edge ids per check row
    col_members: tuple[tuple[int, ...], ...]  # base-edge ids per var column
    shifts: tuple[int, ...]  # circulant shift per base edge
    cols: tuple[int, ...]  # base column per base edge


def _structure(qc: QCLayout) -> _Structure:
    K = qc.num_base_edges
    row_members = tuple(
        tuple(int(k) for k in row if k != K) for row in qc.row_edges
    )
    col_members = tuple(
        tuple(int(k) for k in col if k != K) for col in qc.col_edges
    )
    return _Structure(
        Z=qc.Z,
        R=qc.num_base_rows,
        C=qc.num_base_cols,
        K=K,
        row_members=row_members,
        col_members=col_members,
        shifts=tuple(int(s) for s in qc.edge_shift),
        cols=tuple(int(c) for c in qc.edge_col),
    )


_USE_HW_ROLL = True


def _roll(x: Array, s: int, Z: int) -> Array:
    """Roll rows of (Z, Bt) down by s: out[i] = x[(i - s) % Z] (static s)."""
    s = s % Z
    if s == 0:
        return x
    if _USE_HW_ROLL:
        return pltpu.roll(x, s, 0)
    return jnp.concatenate([x[Z - s :], x[: Z - s]], axis=0)


def _phi(x):
    """phi(x) = -log(tanh(x/2)), self-inverse; same constants as
    ops/qc_msg.check_update_sumproduct for cross-implementation parity."""
    return -jnp.log(jnp.tanh(x / 2.0) + 1e-30)


def _run_iterations(iteration, max_iterations: int, early_exit: bool, tile_done):
    """Drive the per-tile iteration loop.

    ``early_exit``: a ``while_loop`` that stops once ``tile_done()`` reports
    every frame in this batch tile converged (each grid step exits
    independently). Bit-exact vs the fixed-trip ``fori_loop``: exit only
    happens after all decisions are frozen, and frozen frames ignore later
    iterations anyway.
    """
    if not early_exit:
        jax.lax.fori_loop(0, max_iterations, iteration, 0, unroll=False)
        return

    def cond(carry):
        t, done = carry
        return jnp.logical_and(t < max_iterations, jnp.logical_not(done))

    def body(carry):
        t, _ = carry
        iteration(t, 0)
        return t + 1, tile_done()

    jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((), jnp.bool_)))


def _kernel(llr_ref, bits_ref, conv_ref, c2v, beliefs, frozen, conv_buf, *, st: _Structure,
            max_iterations: int, alpha: float, mode: str = "minsum",
            track_convergence: bool = True, early_exit: bool = False,
            schedule: str = "flooding"):
    Z, K, C, R = st.Z, st.K, st.C, st.R
    Bt = llr_ref.shape[1]

    c2v[:] = jnp.zeros_like(c2v)
    frozen[:] = jnp.zeros_like(frozen)
    conv_buf[:] = jnp.zeros_like(conv_buf)
    beliefs[:] = llr_ref[:]  # beliefs with c2v = 0

    def ez(k):
        return slice(k * Z, (k + 1) * Z)

    layered = schedule == "layered"

    def iteration(t, _):
        # ---- check update ------------------------------------------------
        # v2c is formed on the fly (belief[var] - c2v), rolled to check
        # alignment, reduced with the running (min, 2nd-min, sign-product)
        # trick, and written back — each edge belongs to exactly one row, so
        # in-place c2v updates never alias another row's reads.
        #
        # schedule="layered": each row folds its new c2v into the beliefs
        # immediately (beliefs[col] += new - old), so later rows in the same
        # sweep see it — serial-C scheduling at identical per-sweep cost
        # (the row loop is already sequential here); the flooding path's
        # end-of-sweep colsum recompute is skipped.
        for r in range(R):
            members = st.row_members[r]
            rolled = []
            if mode == "minsum":
                m1 = jnp.full((Z, Bt), _BIG, jnp.float32)
                m2 = jnp.full((Z, Bt), _BIG, jnp.float32)
                sp = jnp.ones((Z, Bt), jnp.float32)
                for k in members:
                    v2c = beliefs[ez(st.cols[k])] - c2v[ez(k)]
                    # check-aligned view: msg[z_r] = v2c_var[(z_r + s_k) % Z]
                    x = _roll(v2c, -st.shifts[k], Z)
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
                    out = alpha * sp * sgn * loo
                    new = _roll(out, st.shifts[k], Z)
                    if layered:
                        beliefs[ez(st.cols[k])] = (
                            beliefs[ez(st.cols[k])] + new - c2v[ez(k)]
                        )
                    c2v[ez(k)] = new
            else:  # sum-product: leave-one-out via phi-domain sums
                phi_sum = jnp.zeros((Z, Bt), jnp.float32)
                sp = jnp.ones((Z, Bt), jnp.float32)
                phis = []
                for k in members:
                    v2c = beliefs[ez(st.cols[k])] - c2v[ez(k)]
                    x = _roll(v2c, -st.shifts[k], Z)
                    sgn = jnp.where(x < 0, -1.0, 1.0)
                    ph = _phi(jnp.clip(jnp.abs(x), 1e-7, 20.0))
                    rolled.append(sgn)
                    phis.append(ph)
                    phi_sum = phi_sum + ph
                    sp = sp * sgn
                for k, sgn, ph in zip(members, rolled, phis):
                    loo = jnp.maximum(phi_sum - ph, 1e-7)
                    out = sp * sgn * _phi(loo)
                    new = _roll(out, st.shifts[k], Z)
                    if layered:
                        beliefs[ez(st.cols[k])] = (
                            beliefs[ez(st.cols[k])] + new - c2v[ez(k)]
                        )
                    c2v[ez(k)] = new

        # ---- beliefs, bits, syndrome, convergence tracking ---------------
        bits_now = []
        for c in range(C):
            if layered:
                belief = beliefs[ez(c)]
            else:
                colsum = jnp.zeros((Z, Bt), jnp.float32)
                for k in st.col_members[c]:
                    colsum = colsum + c2v[ez(k)]
                belief = llr_ref[ez(c)] + colsum
                beliefs[ez(c)] = belief
            if track_convergence:
                bits_now.append(jnp.where(belief < 0, 1.0, 0.0))
        if track_convergence:
            viol = jnp.zeros((1, Bt), jnp.float32)
            for r in range(R):
                parity = jnp.zeros((Z, Bt), jnp.float32)
                for k in st.row_members[r]:
                    parity = parity + _roll(bits_now[st.cols[k]], -st.shifts[k], Z)
                parity = parity - 2.0 * jnp.floor(parity * 0.5)  # mod 2
                viol = viol + jnp.sum(parity, axis=0, keepdims=True)

            ok = viol == 0.0  # (1, Bt)
            newly = jnp.logical_and(ok, conv_buf[0:1, :] == 0.0)
            for c in range(C):
                frozen[ez(c)] = jnp.where(newly, bits_now[c], frozen[ez(c)])
            conv_buf[0:1, :] = jnp.where(newly, jnp.float32(t + 1), conv_buf[0:1, :])
        return 0

    _run_iterations(iteration, max_iterations, early_exit,
                    lambda: jnp.min(conv_buf[0:1, :]) > 0.0)

    # ---- final outputs ---------------------------------------------------
    converged = conv_buf[0:1, :] > 0.0
    for c in range(C):
        final_bits = jnp.where(beliefs[ez(c)] < 0, 1.0, 0.0)
        bits_ref[ez(c)] = jnp.where(converged, frozen[ez(c)], final_bits)
    conv_ref[:] = jnp.where(
        converged, conv_buf[0:1, :], jnp.float32(max_iterations)
    ) * jnp.ones_like(conv_ref)


def make_fused_minsum(
    qc: QCLayout,
    max_iterations: int = 20,
    alpha: float = 0.75,
    batch_tile: int = 128,
    interpret: bool = False,
    mode: str = "minsum",
    track_convergence: bool = True,
    early_exit: bool = False,
    schedule: str = "flooding",
):
    """Build the fused decoder: (B, n) LLRs -> (bits (B, n), conv_iter (B,)).

    ``batch_tile`` lanes of the batch decode per grid step with all state in
    VMEM (about (2K + 4C) * Z * 4 bytes per lane; ~10 MB at Z=32 tile 128).
    ``interpret=True`` runs the Pallas interpreter (CPU tests).
    ``mode``: "minsum" (scaled, uses alpha) or "sumproduct" (BP).
    ``track_convergence=False`` skips the per-iteration syndrome/freeze pass
    (throughput mode: conv_iter returns max_iterations everywhere, bits are
    the final-iteration decisions — identical for frames that would not have
    early-frozen; classical semantics otherwise).
    ``early_exit=True`` (requires tracking) stops each batch tile's iteration
    loop once all its frames have valid syndromes — same outputs, and at
    operating SNRs most tiles finish in a fraction of ``max_iterations``.
    ``schedule``: "flooding" (reference semantics) or "layered" (serial-C:
    each base row's new c2v folds into the beliefs immediately — ~2x faster
    convergence per iteration at the same per-iteration cost; matches
    :func:`ldpc_tpu.models.classical.make_layered_minsum`).
    """
    if early_exit and not track_convergence:
        raise ValueError("early_exit requires track_convergence=True")
    st = _structure(qc)
    Z, C, K = st.Z, st.C, st.K
    n = C * Z
    need = fused_vmem_bytes(qc, batch_tile)
    if need > _VMEM_HARD_CAP:
        raise ValueError(
            f"fused kernel state ({need / 2**20:.1f} MiB at batch_tile="
            f"{batch_tile}) exceeds the ~{_VMEM_HARD_CAP / 2**20:.0f} MiB VMEM "
            f"cap for Z={Z}; use the XLA backend (decode_min_sum/"
            f"decode_bp) for large lifting factors"
        )

    kernel = functools.partial(
        _kernel, st=st, max_iterations=max_iterations, alpha=alpha, mode=mode,
        track_convergence=track_convergence, early_exit=early_exit,
        schedule=schedule,
    )

    @jax.jit
    def decode(llr: Array):
        B = llr.shape[0]
        if B % batch_tile:
            pad = batch_tile - B % batch_tile
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        llr_cz = llr.reshape(Bp, C, Z).transpose(1, 2, 0).reshape(C * Z, Bp)
        grid = (Bp // batch_tile,)
        bits_cz, conv = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((C * Z, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((C * Z, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, batch_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((C * Z, Bp), jnp.float32),
                jax.ShapeDtypeStruct((8, Bp), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((K * Z, batch_tile), jnp.float32),  # c2v
                pltpu.VMEM((C * Z, batch_tile), jnp.float32),  # beliefs
                pltpu.VMEM((C * Z, batch_tile), jnp.float32),  # frozen bits
                pltpu.VMEM((8, batch_tile), jnp.float32),  # conv iter
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(llr_cz)
        bits = bits_cz.reshape(C, Z, Bp).transpose(2, 0, 1).reshape(Bp, n)
        return bits[:B], conv[0, :B].astype(jnp.int32)

    return decode


# ---------------------------------------------------------------------------
# Large-Z variant: Z in the lane dimension
# ---------------------------------------------------------------------------
#
# The kernel above lays messages out as (Z, batch_tile=128) blocks — batch in
# the lanes — so VMEM holds (K + 5C) * Z * 4 bytes *per lane*, which caps Z
# around 48.  For production 5G lifting sizes (Z up to 384) the same decode
# stays fully VMEM-resident by transposing the layout: each base edge's Z
# circulant positions live in the *lanes* (padded to a 128 multiple) and the
# batch tile drops into the sublanes (8-32 frames).  The check<->variable
# alignment roll becomes a lane rotation, and per-sublane state is
# (K + 5C) * Bt * Zp * 4 bytes total — 5.6 MiB at Z=384 / Bt=8 (75k edges).


def zlane_vmem_bytes(qc: QCLayout, batch_tile: int = 8) -> int:
    Zp = -(-qc.Z // 128) * 128
    return (qc.num_base_edges + 5 * qc.num_base_cols) * batch_tile * Zp * 4


def pick_zlane_batch_tile(qc: QCLayout) -> int:
    """Largest batch tile (sublanes) whose state fits the VMEM budget."""
    for bt in (32, 16, 8):
        if zlane_vmem_bytes(qc, bt) <= _VMEM_BUDGET:
            return bt
    return 0


def _roll_lanes(x: Array, s: int, Z: int) -> Array:
    """Roll the first Z lanes down by s: out[:, i] = x[:, (i-s)%Z] for i < Z.

    Lanes beyond Z (zero padding in the Z%8 layouts) pass through unchanged —
    a plain full-width concat roll would splice the padding into the cyclic
    group when x is wider than Z.
    """
    s = s % Z
    if s == 0:
        return x
    if x.shape[1] == Z and Z % 128 == 0:
        return pltpu.roll(x, s, 1)
    head = jnp.concatenate([x[:, Z - s : Z], x[:, : Z - s]], axis=1)
    if x.shape[1] > Z:
        head = jnp.concatenate([head, x[:, Z:]], axis=1)
    return head


def _kernel_zlane(llr_ref, bits_ref, conv_ref, c2v, beliefs, frozen, conv_buf, *,
                  st: _Structure, max_iterations: int, alpha: float,
                  mode: str = "minsum", track_convergence: bool = True,
                  early_exit: bool = False, schedule: str = "flooding"):
    Z, K, C, R = st.Z, st.K, st.C, st.R
    Bt = conv_ref.shape[0]
    Zp = llr_ref.shape[1]

    c2v[:] = jnp.zeros_like(c2v)
    frozen[:] = jnp.zeros_like(frozen)
    conv_buf[:] = jnp.zeros_like(conv_buf)
    beliefs[:] = llr_ref[:]

    def eb(k):  # edge/column block row range (sublanes)
        return pl.ds(k * Bt, Bt)

    layered = schedule == "layered"

    def iteration(t, _):
        for r in range(R):
            members = st.row_members[r]
            rolled = []
            if mode == "minsum":
                m1 = jnp.full((Bt, Z), _BIG, jnp.float32)
                m2 = jnp.full((Bt, Z), _BIG, jnp.float32)
                sp = jnp.ones((Bt, Z), jnp.float32)
                for k in members:
                    v2c = beliefs[eb(st.cols[k]), :Z] - c2v[eb(k), :Z]
                    x = _roll_lanes(v2c, -st.shifts[k], Z)
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
                    out = alpha * sp * sgn * loo
                    new = _roll_lanes(out, st.shifts[k], Z)
                    if layered:
                        beliefs[eb(st.cols[k]), :Z] = (
                            beliefs[eb(st.cols[k]), :Z] + new - c2v[eb(k), :Z]
                        )
                    c2v[eb(k), :Z] = new
            else:  # sum-product
                phi_sum = jnp.zeros((Bt, Z), jnp.float32)
                sp = jnp.ones((Bt, Z), jnp.float32)
                phis = []
                for k in members:
                    v2c = beliefs[eb(st.cols[k]), :Z] - c2v[eb(k), :Z]
                    x = _roll_lanes(v2c, -st.shifts[k], Z)
                    sgn = jnp.where(x < 0, -1.0, 1.0)
                    ph = _phi(jnp.clip(jnp.abs(x), 1e-7, 20.0))
                    rolled.append(sgn)
                    phis.append(ph)
                    phi_sum = phi_sum + ph
                    sp = sp * sgn
                for k, sgn, ph in zip(members, rolled, phis):
                    loo = jnp.maximum(phi_sum - ph, 1e-7)
                    out = sp * sgn * _phi(loo)
                    new = _roll_lanes(out, st.shifts[k], Z)
                    if layered:
                        beliefs[eb(st.cols[k]), :Z] = (
                            beliefs[eb(st.cols[k]), :Z] + new - c2v[eb(k), :Z]
                        )
                    c2v[eb(k), :Z] = new

        if not layered:
            for c in range(C):
                colsum = jnp.zeros((Bt, Z), jnp.float32)
                for k in st.col_members[c]:
                    colsum = colsum + c2v[eb(k), :Z]
                beliefs[eb(c), :Z] = llr_ref[eb(c), :Z] + colsum
        if track_convergence:
            # Parity via sign-products read straight from the beliefs scratch
            # (sum mod 2 == 0  <=>  product of per-bit signs == +1): no
            # mod-2 arithmetic, no list of C live (Bt, Z) hard-bit arrays
            # spilling to the Mosaic stack, one cross-lane reduction and one
            # mask broadcast per iteration — lane ops are the costly ones in
            # this layout.
            m = jnp.ones((Bt, Z), jnp.float32)
            for r in range(R):
                sp = jnp.ones((Bt, Z), jnp.float32)
                for k in st.row_members[r]:
                    b = beliefs[eb(st.cols[k]), :Z]
                    sp = sp * _roll_lanes(jnp.where(b < 0, -1.0, 1.0), -st.shifts[k], Z)
                m = jnp.minimum(m, sp)
            ok = jnp.min(m, axis=1, keepdims=True) > 0.0  # (Bt, 1)
            newly = jnp.logical_and(ok, conv_buf[:, 0:1] == 0.0)
            newly_b = jnp.broadcast_to(newly, (Bt, Z))
            for c in range(C):
                bits_c = jnp.where(beliefs[eb(c), :Z] < 0, 1.0, 0.0)
                frozen[eb(c), :Z] = jnp.where(newly_b, bits_c, frozen[eb(c), :Z])
            conv_buf[:, 0:1] = jnp.where(newly, jnp.float32(t + 1), conv_buf[:, 0:1])
        return 0

    _run_iterations(iteration, max_iterations, early_exit,
                    lambda: jnp.min(conv_buf[:, 0:1]) > 0.0)

    converged = conv_buf[:, 0:1] > 0.0
    for c in range(C):
        final_bits = jnp.where(beliefs[eb(c), :Z] < 0, 1.0, 0.0)
        bits_ref[eb(c), :Z] = jnp.where(converged, frozen[eb(c), :Z], final_bits)
    conv_ref[:] = jnp.where(
        converged, conv_buf[:, 0:1], jnp.float32(max_iterations)
    ) * jnp.ones_like(conv_ref)


def make_fused_minsum_zlane(
    qc: QCLayout,
    max_iterations: int = 20,
    alpha: float = 0.75,
    batch_tile: int | None = None,
    interpret: bool = False,
    mode: str = "minsum",
    track_convergence: bool = True,
    early_exit: bool = False,
    schedule: str = "flooding",
):
    """Large-Z fused decoder (Z in lanes): (B, n) LLRs -> (bits, conv_iter).

    Same semantics as :func:`make_fused_minsum` (including ``early_exit``
    and ``schedule``);
    use for Z where the batch-in-lanes layout exceeds VMEM
    (``fused_kernel_fits`` False). ``batch_tile`` is the sublane tile
    (default: largest of 8/16/32 that fits). Requires Z % 8 == 0
    (sublane-transpose-free lane padding).
    """
    if early_exit and not track_convergence:
        raise ValueError("early_exit requires track_convergence=True")
    st = _structure(qc)
    Z, C, K = st.Z, st.C, st.K
    n = C * Z
    Zp = -(-Z // 128) * 128
    if Z % 8:
        raise ValueError(f"zlane kernel requires Z % 8 == 0, got Z={Z}")
    Bt = batch_tile or pick_zlane_batch_tile(qc)
    if not Bt or zlane_vmem_bytes(qc, Bt) > _VMEM_BUDGET:
        raise ValueError(
            f"zlane kernel state exceeds the ~{_VMEM_BUDGET / 2**20:.0f} MiB "
            f"VMEM budget at Z={Z} (batch_tile={Bt})"
        )

    kernel = functools.partial(
        _kernel_zlane, st=st, max_iterations=max_iterations, alpha=alpha,
        mode=mode, track_convergence=track_convergence, early_exit=early_exit,
        schedule=schedule,
    )

    @jax.jit
    def decode(llr: Array):
        B = llr.shape[0]
        if B % Bt:
            pad = Bt - B % Bt
            llr = jnp.concatenate([llr, jnp.zeros((pad, n), llr.dtype)], axis=0)
        Bp = llr.shape[0]
        nt = Bp // Bt
        # (B, n) -> (nt*C*Bt, Zp): per tile, per base column, Bt sublane rows
        # of Z lanes (zero-padded to Zp).
        g = llr.reshape(nt, Bt, C, Z).transpose(0, 2, 1, 3).reshape(nt * C * Bt, Z)
        if Zp != Z:
            g = jnp.pad(g, ((0, 0), (0, Zp - Z)))
        bits_g, conv = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((C * Bt, Zp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((C * Bt, Zp), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Bt, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nt * C * Bt, Zp), jnp.float32),
                jax.ShapeDtypeStruct((nt * Bt, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((K * Bt, Zp), jnp.float32),  # c2v
                pltpu.VMEM((C * Bt, Zp), jnp.float32),  # beliefs
                pltpu.VMEM((C * Bt, Zp), jnp.float32),  # frozen bits
                pltpu.VMEM((Bt, 128), jnp.float32),  # conv iter
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(g)
        bits = (
            bits_g.reshape(nt, C, Bt, Zp)[..., :Z]
            .transpose(0, 2, 1, 3)
            .reshape(Bp, n)
        )
        return bits[:B], conv[:B, 0].astype(jnp.int32)

    return decode


def make_fused_bp(
    qc: QCLayout,
    max_iterations: int = 50,
    batch_tile: int = 128,
    interpret: bool = False,
):
    """Fused sum-product (belief propagation) decoder — see make_fused_minsum."""
    return make_fused_minsum(
        qc, max_iterations, alpha=1.0, batch_tile=batch_tile, interpret=interpret,
        mode="sumproduct",
    )
