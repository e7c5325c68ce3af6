"""Classical decoder tests: golden-model parity, decoding power, early-stop stats."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import expand_base_matrix, get_base_graph, qc_layout
from ldpc_tpu.models.classical import (
    BeliefPropagationDecoder,
    MinSumScaledDecoder,
    decode_bp,
    decode_min_sum,
)
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.utils import channel as ch

from golden import golden_message_passing


@pytest.fixture(scope="module")
def toy():
    bg = get_base_graph("toy_4x8")
    Z = 4
    qc = qc_layout(bg, Z)
    return bg, Z, qc, expand_base_matrix(bg, Z), qc_msg.make_plan(qc)


class TestGoldenParity:
    @pytest.mark.parametrize("iters", [1, 3, 7])
    def test_minsum_beliefs_bit_exact(self, toy, iters, rng):
        _, _, qc, H, plan = toy
        llr = rng.normal(size=(5, H.shape[1])).astype(np.float32) * 3
        got = decode_min_sum(jnp.asarray(llr), plan, iters, 0.75)
        want = golden_message_passing(H, llr, iters, "minsum", alpha=0.75)
        np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("iters", [1, 4])
    def test_sumproduct_beliefs(self, toy, iters, rng):
        _, _, qc, H, plan = toy
        llr = rng.normal(size=(5, H.shape[1])).astype(np.float32) * 2
        got = decode_bp(jnp.asarray(llr), plan, iters)
        want = golden_message_passing(H, llr, iters, "sumproduct")
        np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-3, atol=1e-3)

    def test_minsum_on_nr_code(self, rng):
        bg = get_base_graph("nr_2_0_4")
        qc = qc_layout(bg, 4)
        plan = qc_msg.make_plan(qc)
        H = expand_base_matrix(bg, 4)
        llr = rng.normal(size=(2, H.shape[1])).astype(np.float32) * 3
        got = decode_min_sum(jnp.asarray(llr), plan, 3, 0.75)
        want = golden_message_passing(H, llr, 3, "minsum", alpha=0.75)
        np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-4, atol=1e-4)


class TestDecoding:
    def test_zero_codeword_high_snr(self, toy):
        _, _, _, H, plan = toy
        n = H.shape[1]
        bits = jnp.zeros((64, n))
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(0), bits, 8.0)
        res = decode_min_sum(llr, plan, 20, 0.75)
        assert float(res.bits.sum()) == 0.0
        assert bool(res.converged.all())

    def test_corrects_noise_beyond_hard_decision(self):
        # At moderate SNR the decoder must fix frames the raw channel gets wrong.
        bg = get_base_graph("nr_2_0_4")
        plan = qc_msg.make_plan(qc_layout(bg, 4))
        n = plan.C * plan.Z
        bits = jnp.zeros((256, n))
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(1), bits, 3.0)
        raw_errors = float((llr < 0).sum())
        res = decode_min_sum(llr, plan, 25, 0.75)
        decoded_errors = float(res.bits.sum())
        assert raw_errors > 0
        assert decoded_errors < raw_errors / 4

    def test_bp_beats_or_matches_minsum(self):
        bg = get_base_graph("nr_2_0_4")
        plan = qc_msg.make_plan(qc_layout(bg, 4))
        n = plan.C * plan.Z
        bits = jnp.zeros((512, n))
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(2), bits, 2.0)
        ms = decode_min_sum(llr, plan, 25, 0.75)
        bp = decode_bp(llr, plan, 25)
        assert float(bp.bits.sum()) <= float(ms.bits.sum()) * 1.5 + 10

    def test_early_stop_iterations(self, toy):
        _, _, _, H, plan = toy
        n = H.shape[1]
        bits = jnp.zeros((32, n))
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(3), bits, 8.0)
        res = decode_min_sum(llr, plan, 50, 0.75)
        # At 8 dB everything converges fast
        assert bool(res.converged.all())
        assert int(res.conv_iter.max()) <= 5

    def test_converged_frames_satisfy_syndrome(self, toy):
        _, _, _, H, plan = toy
        n = H.shape[1]
        bits = jnp.zeros((64, n))
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(4), bits, 1.0)
        res = decode_min_sum(llr, plan, 30, 0.75)
        syn = (np.asarray(res.bits) @ H.T) % 2
        conv = np.asarray(res.converged)
        assert (syn[conv].sum(axis=1) == 0).all()


class TestObjectAPI:
    def test_wrappers(self, toy):
        _, _, qc, H, _ = toy
        n = H.shape[1]
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(5), jnp.zeros((8, n)), 5.0)
        for dec in (BeliefPropagationDecoder(qc, 20), MinSumScaledDecoder(qc, 20, 0.8)):
            out_bits, iters = dec.decode(llr)
            assert out_bits.shape == (8, n)
            assert 1 <= iters <= 20


class TestEarlyExit:
    """The while-loop early-exit path must match the fixed-trip scan."""

    @pytest.mark.parametrize("decode", [decode_min_sum, decode_bp])
    def test_decisions_and_stats_match_scan(self, toy, decode, rng):
        _, _, _, H, plan = toy
        n = H.shape[1]
        # Mixed-SNR batch: some frames converge instantly, some never do.
        bits = jnp.zeros((32, n))
        llr_hi = ch.bpsk_awgn_llr(jax.random.PRNGKey(0), bits[:16], 6.0)
        llr_lo = ch.bpsk_awgn_llr(jax.random.PRNGKey(1), bits[16:], -4.0)
        llr = jnp.concatenate([llr_hi, llr_lo])
        a = decode(llr, plan, 12)
        b = decode(llr, plan, 12, early_exit=True)
        np.testing.assert_array_equal(np.asarray(a.bits), np.asarray(b.bits))
        np.testing.assert_array_equal(np.asarray(a.conv_iter), np.asarray(b.conv_iter))
        np.testing.assert_array_equal(np.asarray(a.converged), np.asarray(b.converged))

    def test_all_converged_beliefs_frozen_decisions(self, toy):
        _, _, _, H, plan = toy
        bits = jnp.zeros((8, H.shape[1]))
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(2), bits, 8.0)
        res = decode_min_sum(llr, plan, 50, early_exit=True)
        assert bool(res.converged.all())
        assert int(res.conv_iter.max()) <= 3
        np.testing.assert_array_equal(np.asarray(res.bits), 0.0)
