"""Layered (serial-C) min-sum schedule: golden parity, kernel parity, and
the convergence advantage that justifies the feature."""
import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.codes import expand_base_matrix, get_base_graph, qc_layout
from ldpc_tpu.models.classical import MinSumScaledDecoder, decode_min_sum, make_layered_minsum
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.ops.pallas_minsum import make_fused_minsum, make_fused_minsum_zlane
from ldpc_tpu.utils import bpsk_awgn_llr

from golden import golden_layered_minsum


def test_beliefs_match_golden(rng):
    bg = get_base_graph("toy_4x8")
    Z = 4
    qc = qc_layout(bg, Z)
    H = expand_base_matrix(bg, Z)
    llr = rng.normal(size=(5, H.shape[1])).astype(np.float32) * 3
    decode = make_layered_minsum(qc, max_iterations=4, alpha=0.75)
    got = decode(jnp.asarray(llr))
    want = golden_layered_minsum(H, llr, 4, 0.75, Z)
    np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-5, atol=1e-5)


def test_beliefs_match_golden_nr(rng):
    bg = get_base_graph("nr_2_0_4")
    qc = qc_layout(bg, 4)
    H = expand_base_matrix(bg, 4)
    llr = rng.normal(size=(2, H.shape[1])).astype(np.float32) * 3
    decode = make_layered_minsum(qc, max_iterations=2, alpha=0.75)
    got = decode(jnp.asarray(llr))
    want = golden_layered_minsum(H, llr, 2, 0.75, 4)
    np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-4, atol=1e-4)


def test_fused_kernel_matches_xla_layered():
    qc = qc_layout(get_base_graph("nr_2_0_4"), 4)
    n = qc.num_base_cols * qc.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((16, n)), 1.0)
    xla = make_layered_minsum(qc, max_iterations=6, alpha=0.75)
    fused = make_fused_minsum(qc, 6, 0.75, batch_tile=8, interpret=True,
                              schedule="layered")
    ref = xla(llr)
    bits, conv = fused(llr)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref.bits))
    c1, c2 = np.asarray(conv), np.asarray(ref.conv_iter)
    assert (c1 == c2).mean() >= 0.99


def test_zlane_kernel_matches_xla_layered():
    qc = qc_layout(get_base_graph("toy_4x8"), 8)
    n = qc.num_base_cols * qc.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((8, n)), 2.0)
    xla = make_layered_minsum(qc, max_iterations=6, alpha=0.75)
    fused = make_fused_minsum_zlane(qc, 6, 0.75, batch_tile=8, interpret=True,
                                    schedule="layered")
    ref = xla(llr)
    bits, conv = fused(llr)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(ref.bits))
    np.testing.assert_array_equal(np.asarray(conv), np.asarray(ref.conv_iter))


def test_layered_converges_faster_than_flooding():
    """The point of the schedule: fewer iterations to a valid syndrome."""
    qc = qc_layout(get_base_graph("nr_2_0_4"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(2), jnp.zeros((256, n)), 2.0)
    flood = decode_min_sum(llr, plan, 30, 0.75)
    layered = make_layered_minsum(qc, max_iterations=30, alpha=0.75)(llr)
    f_mean = float(flood.conv_iter.mean())
    l_mean = float(layered.conv_iter.mean())
    assert float(layered.converged.mean()) >= float(flood.converged.mean())
    # classic result: layered needs ~half the iterations of flooding
    assert l_mean < 0.7 * f_mean, (l_mean, f_mean)


def test_wrapper_schedule_option():
    qc = qc_layout(get_base_graph("toy_4x8"), 4)
    n = qc.num_base_cols * qc.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(3), jnp.zeros((16, n)), 7.0)
    dec = MinSumScaledDecoder(qc, max_iterations=20, schedule="layered",
                              backend="xla")
    bits, iters = dec.decode(llr)
    assert bits.shape == (16, n)
    np.testing.assert_array_equal(np.asarray(bits), 0.0)
    assert 1 <= iters <= 20


def test_layered_early_exit_matches():
    qc = qc_layout(get_base_graph("nr_2_0_4"), 4)
    n = qc.num_base_cols * qc.Z
    llr = bpsk_awgn_llr(jax.random.PRNGKey(4), jnp.zeros((32, n)), 1.0)
    fixed = make_layered_minsum(qc, 15, 0.75)(llr)
    early = make_layered_minsum(qc, 15, 0.75, early_exit=True)(llr)
    np.testing.assert_array_equal(np.asarray(fixed.bits), np.asarray(early.bits))
    np.testing.assert_array_equal(np.asarray(fixed.conv_iter), np.asarray(early.conv_iter))
