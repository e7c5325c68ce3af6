"""Fused Pallas min-sum kernel: exact parity with the XLA decoder (interpret
mode on CPU; the real-TPU path is exercised by bench.py)."""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.classical import decode_min_sum
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.ops.pallas_minsum import make_fused_minsum
from ldpc_tpu.utils import bpsk_awgn_llr


@pytest.mark.parametrize("name,Z,iters", [("toy_4x8", 4, 5), ("nr_2_0_4", 4, 8)])
def test_matches_xla_decoder(name, Z, iters):
    qc = qc_layout(get_base_graph(name), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((16, n)), 2.0)
    fused = make_fused_minsum(qc, max_iterations=iters, alpha=0.75, batch_tile=8,
                              interpret=True)
    bits, conv = fused(llr)
    ref = decode_min_sum(llr, plan, iters, 0.75)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref.bits))
    # conv_iter may differ by 1 on a tiny fraction of frames: the XLA path
    # sums check messages via a matmul, the kernel via sequential adds, and
    # beliefs at an exact tie can flip a mid-decode bit (final bits agree).
    c1, c2 = np.asarray(conv), np.asarray(ref.conv_iter)
    assert (np.abs(c1 - c2) <= 1).all()
    assert (c1 == c2).mean() >= 0.99


def test_batch_padding():
    qc = qc_layout(get_base_graph("toy_4x8"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((5, n)), 4.0)  # 5 % 8 != 0
    fused = make_fused_minsum(qc, max_iterations=6, batch_tile=8, interpret=True)
    bits, conv = fused(llr)
    assert bits.shape == (5, n)
    ref = decode_min_sum(llr, plan, 6, 0.75)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref.bits))


def test_bp_mode_matches_xla_decoder():
    from ldpc_tpu.models.classical import decode_bp
    from ldpc_tpu.ops.pallas_minsum import make_fused_bp

    qc = qc_layout(get_base_graph("nr_2_0_4"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(2), jnp.zeros((16, n)), 1.0)
    fused = make_fused_bp(qc, max_iterations=8, batch_tile=8, interpret=True)
    bits, conv = fused(llr)
    ref = decode_bp(llr, plan, 8)
    b1, b2 = np.asarray(bits), np.asarray(ref.bits)
    assert (b1 == b2).mean() >= 0.999
    c1, c2 = np.asarray(conv), np.asarray(ref.conv_iter)
    assert (np.abs(c1 - c2) <= 1).all()


def test_large_Z_rejected_with_clear_error():
    qc = qc_layout(get_base_graph("nr_2_0_32"), 384)
    with pytest.raises(ValueError, match="VMEM"):
        make_fused_minsum(qc, 10)


def test_large_Z_xla_path_works():
    """Z=384 (75k edges) decodes through the XLA backend."""
    qc = qc_layout(get_base_graph("nr_2_0_32"), 384)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((4, n)), 3.0)
    res = decode_min_sum(llr, plan, 5, 0.75)
    assert res.bits.shape == (4, n)
    assert float(res.bits.sum()) == 0.0


@pytest.mark.parametrize("seed", [0, 1])
def test_random_graph_kernel_parity(seed):
    """Fused kernel matches the XLA decoder on random QC structures."""
    from ldpc_tpu.codes import BaseGraph

    rng = np.random.default_rng(seed)
    shifts = rng.integers(-1, 10, size=(4, 7))
    for c in range(7):
        if (shifts[:, c] < 0).all():
            shifts[rng.integers(0, 4), c] = 1
    for r in range(4):
        if (shifts[r] < 0).all():
            shifts[r, rng.integers(0, 7)] = 1
    bg = BaseGraph(f"rk{seed}", shifts)
    Z = 8
    qc = qc_layout(bg, Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(seed), jnp.zeros((8, n)), 1.0)
    fused = make_fused_minsum(qc, max_iterations=6, alpha=0.75, batch_tile=8,
                              interpret=True)
    bits, conv = fused(llr)
    ref = decode_min_sum(llr, plan, 6, 0.75)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref.bits))


class TestZLane:
    """Large-Z (Z-in-lanes) kernel: parity with the XLA decoder."""

    @pytest.mark.parametrize("name,Z,iters", [
        ("toy_4x8", 16, 5),       # Zp=128, heavy lane padding
        ("toy_4x8", 128, 4),      # exact lane multiple (pltpu.roll path)
        ("nr_2_0_4", 24, 6),      # non-multiple Z, concat-roll path
    ])
    def test_matches_xla_decoder(self, name, Z, iters):
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum_zlane

        qc = qc_layout(get_base_graph(name), Z)
        plan = qc_msg.make_plan(qc)
        n = plan.C * plan.Z
        llr = bpsk_awgn_llr(jax.random.PRNGKey(7), jnp.zeros((9, n)), 2.0)
        fused = make_fused_minsum_zlane(qc, max_iterations=iters, alpha=0.75,
                                        batch_tile=8, interpret=True)
        bits, conv = fused(llr)  # 9 % 8 != 0: batch padding covered too
        ref = decode_min_sum(llr, plan, iters, 0.75)
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref.bits))
        c1, c2 = np.asarray(conv), np.asarray(ref.conv_iter)
        assert (np.abs(c1 - c2) <= 1).all()

    def test_bp_mode(self):
        from ldpc_tpu.models.classical import decode_bp
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum_zlane

        qc = qc_layout(get_base_graph("toy_4x8"), 32)
        plan = qc_msg.make_plan(qc)
        n = plan.C * plan.Z
        llr = bpsk_awgn_llr(jax.random.PRNGKey(8), jnp.zeros((8, n)), 1.0)
        fused = make_fused_minsum_zlane(qc, max_iterations=6, batch_tile=8,
                                        interpret=True, mode="sumproduct")
        bits, conv = fused(llr)
        ref = decode_bp(llr, plan, 6)
        assert (np.asarray(bits) == np.asarray(ref.bits)).mean() >= 0.999

    def test_z384_fits_vmem(self):
        """The production Z=384 state fits the VMEM budget (no TPU needed to
        check the arithmetic; the real-TPU run is exercised by bench tools)."""
        from ldpc_tpu.ops.pallas_minsum import pick_zlane_batch_tile, zlane_vmem_bytes

        qc = qc_layout(get_base_graph("nr_2_0_32"), 384)
        bt = pick_zlane_batch_tile(qc)
        assert bt >= 8
        assert zlane_vmem_bytes(qc, bt) <= 14 * 2**20

    def test_odd_Z_rejected(self):
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum_zlane

        qc = qc_layout(get_base_graph("toy_4x8"), 12)
        with pytest.raises(ValueError, match="Z % 8"):
            make_fused_minsum_zlane(qc, 4, batch_tile=8, interpret=True)


def test_no_track_mode_final_bits_match():
    qc = qc_layout(get_base_graph("toy_4x8"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(3), jnp.zeros((8, n)), 0.0)
    tracked = make_fused_minsum(qc, 6, batch_tile=8, interpret=True)
    fast = make_fused_minsum(qc, 6, batch_tile=8, interpret=True, track_convergence=False)
    bt, ct = tracked(llr)
    bf, cf = fast(llr)
    ref = decode_min_sum(llr, plan, 6, 0.75)
    # throughput mode returns the final-iteration bits for every frame
    final_bits = (ref.beliefs < 0).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(bf), np.asarray(final_bits))
    assert (np.asarray(cf) == 6).all()


class TestEarlyExitKernel:
    """In-kernel early exit (while_loop): identical outputs to the
    fixed-trip kernel, per batch tile."""

    def test_matches_fixed_trip(self):
        qc = qc_layout(get_base_graph("nr_2_0_4"), 4)
        n = qc.num_base_cols * qc.Z
        # Mix of SNRs so some tiles converge early and some never do.
        llr_hi = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((8, n)), 6.0)
        llr_lo = bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((8, n)), -4.0)
        llr = jnp.concatenate([llr_hi, llr_lo])
        fixed = make_fused_minsum(qc, 10, batch_tile=8, interpret=True)
        early = make_fused_minsum(qc, 10, batch_tile=8, interpret=True, early_exit=True)
        b1, c1 = fixed(llr)
        b2, c2 = early(llr)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_zlane_matches_fixed_trip(self):
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum_zlane

        qc = qc_layout(get_base_graph("toy_4x8"), 8)
        n = qc.num_base_cols * qc.Z
        llr = bpsk_awgn_llr(jax.random.PRNGKey(2), jnp.zeros((16, n)), 3.0)
        fixed = make_fused_minsum_zlane(qc, 10, batch_tile=8, interpret=True)
        early = make_fused_minsum_zlane(qc, 10, batch_tile=8, interpret=True,
                                        early_exit=True)
        b1, c1 = fixed(llr)
        b2, c2 = early(llr)
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_requires_tracking(self):
        qc = qc_layout(get_base_graph("toy_4x8"), 4)
        with pytest.raises(ValueError, match="track_convergence"):
            make_fused_minsum(qc, 5, early_exit=True, track_convergence=False)
