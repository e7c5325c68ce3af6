"""Channel tests: modulation mappings, noise statistics, LLR scaling, metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.utils import channel as ch


class TestBPSK:
    def test_mapping(self):
        np.testing.assert_array_equal(
            ch.bpsk_modulate(jnp.array([0.0, 1.0, 0.0])), [1.0, -1.0, 1.0]
        )

    def test_llr_sign_at_high_snr(self):
        key = jax.random.PRNGKey(0)
        bits = jnp.array([[0, 1, 1, 0]] * 8, dtype=jnp.float32)
        llr = ch.bpsk_awgn_llr(key, bits, 20.0)
        # LLR > 0 <=> bit 0 at high SNR
        np.testing.assert_array_equal((llr < 0).astype(jnp.float32), bits)

    def test_llr_scale(self):
        # At snr_db, sigma^2 = 1/snr and LLR = 2 r / sigma^2; mean |LLR| for
        # the noiseless symbol component is 2*snr.
        bits = jnp.zeros((512, 64))
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(1), bits, 10.0)
        assert abs(float(llr.mean()) - 2 * 10.0) < 1.0


class TestQPSK:
    def test_symbol_mapping(self):
        s = ch.qpsk_modulate(jnp.array([0.0, 0.0, 1.0, 1.0, 0.0, 1.0]))
        amp = 1 / np.sqrt(2)
        np.testing.assert_allclose(
            np.asarray(s), [[amp, amp], [-amp, -amp], [amp, -amp]], rtol=1e-6
        )

    def test_odd_length_padding(self):
        s = ch.qpsk_modulate(jnp.array([1.0, 0.0, 1.0]))
        assert s.shape == (2, 2)

    def test_unit_symbol_power(self):
        bits = jax.random.bernoulli(jax.random.PRNGKey(2), shape=(4, 256)).astype(jnp.float32)
        s = ch.qpsk_modulate(bits)
        power = jnp.sum(s**2, axis=-1)  # |I|^2 + |Q|^2 per symbol
        assert abs(float(power.mean()) - 1.0) < 1e-5

    def test_noise_power(self):
        s = ch.qpsk_modulate(jnp.zeros((64, 512)))
        r = ch.awgn_channel(jax.random.PRNGKey(3), s, 3.0)
        noise_power = float(jnp.sum((r - s) ** 2, axis=-1).mean())
        assert abs(noise_power - 10 ** (-0.3)) < 0.02

    def test_roundtrip_high_snr(self):
        bits = jax.random.bernoulli(jax.random.PRNGKey(4), shape=(8, 128)).astype(jnp.float32)
        llr = ch.qpsk_awgn_llr(jax.random.PRNGKey(5), bits, 15.0)
        assert llr.shape == bits.shape
        np.testing.assert_array_equal((llr < 0).astype(jnp.float32), bits)

    def test_convention_scale_ratio(self):
        bits = jnp.zeros((4, 64))
        key = jax.random.PRNGKey(6)
        a = ch.qpsk_awgn_llr(key, bits, 2.0, convention="consistent")
        b = ch.qpsk_awgn_llr(key, bits, 2.0, convention="reference_package")
        np.testing.assert_allclose(np.asarray(a), 2 * np.asarray(b), rtol=1e-5)


class TestMetrics:
    def test_counts(self):
        tx = jnp.array([[0, 0, 1, 1], [1, 0, 1, 0]], dtype=jnp.float32)
        rx = jnp.array([[0, 1, 1, 1], [1, 0, 1, 0]], dtype=jnp.float32)
        be, fe, nb, nf = ch.error_counts(tx, rx)
        assert (float(be), float(fe), float(nb), float(nf)) == (1.0, 1.0, 8.0, 2.0)

    def test_ber_fer(self):
        tx = jnp.zeros((4, 10))
        rx = tx.at[0, 0].set(1.0)
        ber, fer = ch.compute_ber_fer(tx, rx)
        assert abs(float(ber) - 1 / 40) < 1e-6
        assert abs(float(fer) - 1 / 4) < 1e-6


@pytest.mark.parametrize("snr", [-2.0, 0.0, 3.0])
def test_theoretical_ber_positive(snr):
    assert 0 < float(ch.theoretical_qpsk_ber(snr)) < 1
