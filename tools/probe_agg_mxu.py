"""Second-decomposition probe: circulant alignment on the MXU (VERDICT r4 #7).

docs/PERFORMANCE.md closes the v1-v4 kernel bracket with "per-edge VPU work
(rolls, means, relu/cast, residual) serialized against the matmul stream is
the binding constraint" and names untried decompositions outside that
family.  This probe tests the claim from outside: the check-relation
aggregation stage of the GNN iteration — the per-edge hot loop whose VPU
cost is 2 dynamic lane rotations + adds per base-edge membership — is
implemented two ways over identical data and iterated L times:

* ``vpu``: exactly the production pattern (`ops/pallas_gnn.py` `_kernel`):
  per-member ``pltpu.roll`` (f32 round-trip around bf16 blocks) + f32
  accumulate, then a per-edge roll-back of the row mean.
* ``mxu``: the SAME math as matmuls — a lane rotation by ``s*Bt`` equals
  right-multiplication by a static 128x128 0/1 rotation matrix, which is
  EXACT in bf16 (each output element is a single product), so
  ``aligned = feats @ P[s]`` moves the entire per-edge alignment+reduce
  stream onto the MXU, leaving the VPU only casts and scalar scaling.

If Mosaic's VPU serialization is the ceiling of the v1-v4 family and the
MXU stream has headroom (GNN MFU ~15%), the mxu variant should beat the
vpu variant on the same stage; either outcome closes the "second
decomposition" question with a measured number.

Usage:
    PYTHONPATH=. python tools/probe_agg_mxu.py --check        # CPU numerics
    PYTHONPATH=. python tools/probe_agg_mxu.py                # TPU timing
"""
from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.ops.pallas_minsum import _structure

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _kernel(f_ref, p_ref, out_ref, cur, rowm, *, st, h, L, Bt, variant):
    K, R, Z = st.K, st.R, st.Z
    f32, bf16 = jnp.float32, jnp.bfloat16
    inv_dr = [1.0 / max(len(st.row_members[r]), 1) for r in range(R)]

    def fb(k):
        return pl.ds(k * h, h)

    def roll(x, s):  # production-pattern VPU lane rotation (f32 only)
        c = (s % Z) * Bt
        if c == 0:
            return x
        return pltpu.roll(x, c, 1)

    def pmat(s):  # (128, 128) bf16 rotation block for shift s
        return p_ref[pl.ds((s % Z) * 128, 128), :]

    cur[:, :] = f_ref[:, :]

    def iteration(t, _):
        for r in range(R):
            acc = jnp.zeros((h, 128), f32)
            for k in st.row_members[r]:
                if variant == "vpu":
                    acc = acc + roll(cur[fb(k), :].astype(f32), -st.shifts[k])
                else:
                    acc = acc + jnp.dot(cur[fb(k), :], pmat(-st.shifts[k]),
                                        preferred_element_type=f32)
            rowm[fb(r), :] = (acc * inv_dr[r]).astype(bf16)
        for k in range(K):
            r = st_rows[k]
            if variant == "vpu":
                cur[fb(k), :] = roll(rowm[fb(r), :].astype(f32),
                                     st.shifts[k]).astype(bf16)
            else:
                cur[fb(k), :] = jnp.dot(rowm[fb(r), :], pmat(st.shifts[k]),
                                        preferred_element_type=f32).astype(bf16)
        return 0

    st_rows = [None] * K
    for r in range(R):
        for k in st.row_members[r]:
            st_rows[k] = r
    jax.lax.fori_loop(0, L, iteration, 0, unroll=False)
    out_ref[:, :] = cur[:, :]


def make_probe(qc, h, L, ntiles, variant, interpret=False):
    st = _structure(qc)
    Z, K, R = st.Z, st.K, st.R
    assert 128 % Z == 0, "probe uses the packed lane layout"
    Bt = 128 // Z

    pm = np.zeros((Z * 128, 128), np.float32)
    for z in range(Z):
        pm[z * 128 : (z + 1) * 128] = np.roll(np.eye(128), z * Bt, axis=1)
    pm = jnp.asarray(pm, jnp.bfloat16)

    kern = functools.partial(_kernel, st=st, h=h, L=L, Bt=Bt, variant=variant)

    def run(feats):  # (K*h, ntiles*128) bf16
        return pl.pallas_call(
            kern,
            grid=(ntiles,),
            in_specs=[
                pl.BlockSpec((K * h, 128), lambda b: (0, b)),
                pl.BlockSpec((Z * 128, 128), lambda b: (0, 0)),
            ],
            out_specs=pl.BlockSpec((K * h, 128), lambda b: (0, b)),
            out_shape=jax.ShapeDtypeStruct((K * h, ntiles * 128), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((K * h, 128), jnp.bfloat16),
                pltpu.VMEM((R * h, 128), jnp.bfloat16),
            ],
            compiler_params=_COMPILER_PARAMS,
            interpret=interpret,
        )(feats, pm)

    return jax.jit(run)


def reference(feats, qc, h, L, ntiles):
    """Plain-XLA reference of the iterated stage (same accumulation order
    class; bf16 storage between iterations like the kernels)."""
    st = _structure(qc)
    Z, K, R = st.Z, st.K, st.R
    Bt = 128 // Z
    f = feats.reshape(K, h, ntiles * 128).astype(jnp.float32)

    def lanes_roll(x, s):  # jnp.roll per 128-lane tile
        c = (s % Z) * Bt
        xt = x.reshape(h, ntiles, 128)
        return jnp.roll(xt, c, axis=2).reshape(h, ntiles * 128)

    for _ in range(L):
        rowm = []
        for r in range(R):
            acc = sum(lanes_roll(f[k], -st.shifts[k]) for k in st.row_members[r])
            rowm.append((acc / max(len(st.row_members[r]), 1)).astype(jnp.bfloat16))
        new = [None] * K
        for r in range(R):
            for k in st.row_members[r]:
                new[k] = lanes_roll(rowm[r].astype(jnp.float32), st.shifts[k]).astype(jnp.bfloat16)
        f = jnp.stack([x.astype(jnp.float32) for x in new])
    return jnp.stack(f).astype(jnp.bfloat16).reshape(K * h, ntiles * 128)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="nr_2_0_32")
    ap.add_argument("--Z", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ntiles", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="CPU interpret-mode numeric check (tiny config)")
    args = ap.parse_args()

    if args.check:
        import os

        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
        jax.config.update("jax_platforms", "cpu")
        args.ntiles, args.iters = 2, 3

    qc = qc_layout(get_base_graph(args.code), args.Z)
    st = _structure(qc)
    h, L, ntiles = args.hidden, args.iters, args.ntiles
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (st.K * h, ntiles * 128), jnp.float32).astype(jnp.bfloat16)

    if args.check:
        ref = reference(feats, qc, h, L, ntiles)
        for variant in ("vpu", "mxu"):
            out = make_probe(qc, h, L, ntiles, variant, interpret=True)(feats)
            d = jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))
            scale = jnp.abs(ref.astype(jnp.float32)).max()
            print(f"{variant}: max|diff| {float(d.max()):.3e} "
                  f"(scale {float(scale):.3e})")
            assert float(d.max()) <= 2e-2 * float(scale), variant
        print("numerics OK")
        return

    results = {}
    for variant in ("vpu", "mxu"):
        fn = make_probe(qc, h, L, ntiles, variant)
        x = fn(feats)
        _ = float(x.astype(jnp.float32).sum())  # compile + sync
        means = []
        for w in range(args.windows):
            t0 = time.time()
            for _ in range(args.reps):
                x = fn(feats)
            _ = float(x.astype(jnp.float32).sum())
            means.append((time.time() - t0) / args.reps)
            time.sleep(2)
        med = sorted(means)[len(means) // 2]
        us_per_tile_iter = med / (ntiles * L) * 1e6
        results[variant] = {
            "window_ms": [round(m * 1e3, 2) for m in means],
            "us_per_tile_iteration": round(us_per_tile_iter, 2),
        }
        print(f"{variant}: {us_per_tile_iter:.1f} us/tile/iteration "
              f"(windows {results[variant]['window_ms']} ms)", flush=True)
    ratio = (results["vpu"]["us_per_tile_iteration"]
             / results["mxu"]["us_per_tile_iteration"])
    results["mxu_speedup"] = round(ratio, 3)
    print(json.dumps({"config": vars(args), "results": results}))


if __name__ == "__main__":
    main()
