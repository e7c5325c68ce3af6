"""Modulation, AWGN channel simulation, LLR demodulation, and error metrics.

Functional JAX counterpart of the reference ``utils/channel.py``.  Every
random function takes an explicit ``jax.random`` key (replacing torch's
global RNG) so Monte-Carlo sweeps are reproducible and shardable: the same
(key, snr, trial) grid gives bit-identical results at any device count.

TPU note: complex dtypes are avoided on the hot path — QPSK symbols are real
arrays of shape ``(..., n_symbols, 2)`` carrying (I, Q).  TPUs have no native
complex support; keeping I/Q as a trailing real axis lets XLA vectorize the
channel on the VPU and transfers cleanly.

Noise-variance convention
-------------------------
SNR is treated as Es/N0 in dB (as in the reference — no Eb/N0 rate
normalization).  The reference has *two inconsistent* QPSK conventions
(SURVEY.md §2 note 7):

* ``consistent`` (default): per-component noise variance sigma^2 = 1/(2*snr)
  and LLR = 2 r / sigma^2 — the reference notebook (cell 11) and
  ``examples/run_message_gnn.py:167-180`` behavior; channel and demodulator
  agree, so LLRs are correctly scaled.
* ``reference_package``: channel adds per-component variance 1/(2*snr) but the
  demodulator divides by sigma^2 = 1/snr (``utils/channel.py:119-122``),
  halving the LLR scale.  Kept as an option for bug-for-bug parity studies.

BPSK (`AWGNChannel.transmit`, ``utils/channel.py:193-231``) uses a real
channel with noise std 1/sqrt(snr) and LLR = 2 r / sigma^2; reproduced
exactly by :func:`bpsk_awgn_llr`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def snr_db_to_linear(snr_db) -> Array:
    return 10.0 ** (jnp.asarray(snr_db, dtype=jnp.float32) / 10.0)


def ebn0_to_esn0(ebn0_db, code_rate: float, bits_per_symbol: int = 2):
    """Eb/N0 (dB) -> Es/N0 (dB): Es/N0 = Eb/N0 + 10 log10(rate * bits/sym).

    The reference treats SNR as Es/N0 throughout and never rate-normalizes
    (SURVEY.md §2 note 8); this optional helper makes Eb/N0 sweeps explicit
    for literature-comparable curves.
    """
    import math

    return jnp.asarray(ebn0_db, jnp.float32) + 10.0 * math.log10(code_rate * bits_per_symbol)


# ---------------------------------------------------------------------------
# BPSK one-shot channel (reference AWGNChannel.transmit)
# ---------------------------------------------------------------------------


def bpsk_modulate(bits: Array) -> Array:
    """0 -> +1, 1 -> -1."""
    return 1.0 - 2.0 * bits.astype(jnp.float32)


def bpsk_awgn_llr(key: Array, bits: Array, snr_db) -> Array:
    """BPSK + AWGN + LLR in one shot. LLR > 0 favors bit 0.

    Matches reference ``AWGNChannel.transmit`` exactly: noise std
    1/sqrt(snr_linear), LLR = 2 r / sigma^2.
    """
    snr = snr_db_to_linear(snr_db)
    sigma = jax.lax.rsqrt(snr)
    symbols = bpsk_modulate(bits)
    received = symbols + sigma * jax.random.normal(key, symbols.shape, dtype=jnp.float32)
    return 2.0 * received / (sigma * sigma)


# ---------------------------------------------------------------------------
# QPSK pipeline (real I/Q representation)
# ---------------------------------------------------------------------------


def qpsk_modulate(bits: Array) -> Array:
    """Gray QPSK: even bits -> I, odd bits -> Q, each 0 -> +1/sqrt2, 1 -> -1/sqrt2.

    Vectorized equivalent of the reference's per-batch loop
    (``utils/channel.py:4-60``).  Odd bit counts are padded with a 0 bit.
    Returns float32 of shape (..., ceil(n/2), 2) carrying (I, Q).
    """
    n = bits.shape[-1]
    if n % 2 == 1:
        pad = [(0, 0)] * (bits.ndim - 1) + [(0, 1)]
        bits = jnp.pad(bits, pad)
    symbols = (1.0 - 2.0 * bits.astype(jnp.float32)) / jnp.sqrt(2.0)  # +-1/sqrt2
    return symbols.reshape(*bits.shape[:-1], -1, 2)


def awgn_channel(key: Array, symbols: Array, snr_db, convention: str = "consistent") -> Array:
    """Add AWGN with total noise power 1/snr per symbol (1/(2*snr) per I/Q component)."""
    del convention  # both conventions add the same noise; they differ at demod
    snr = snr_db_to_linear(snr_db)
    std = jax.lax.rsqrt(2.0 * snr)
    return symbols + std * jax.random.normal(key, symbols.shape, dtype=jnp.float32)


def qpsk_demodulate(received: Array, snr_db, convention: str = "consistent") -> Array:
    """Per-bit LLRs from received (..., n_sym, 2) QPSK symbols, I/Q interleaved.

    ``consistent``: LLR = 2 r / sigma^2 with sigma^2 = 1/(2*snr) (matched
    filter, correct scale).  ``reference_package``: sigma^2 = 1/snr,
    reproducing ``utils/channel.py:119-122``.
    """
    snr = snr_db_to_linear(snr_db)
    if convention == "consistent":
        noise_var = 1.0 / (2.0 * snr)
    elif convention == "reference_package":
        noise_var = 1.0 / snr
    else:
        raise ValueError(f"unknown convention {convention!r}")
    llrs = 2.0 * received / noise_var  # (..., n_sym, 2): I then Q per symbol
    return llrs.reshape(*received.shape[:-2], -1)


def qpsk_awgn_llr(key: Array, bits: Array, snr_db, convention: str = "consistent") -> Array:
    """bits -> QPSK -> AWGN -> LLRs, truncated back to the input bit length."""
    n = bits.shape[-1]
    symbols = qpsk_modulate(bits)
    received = awgn_channel(key, symbols, snr_db, convention)
    return qpsk_demodulate(received, snr_db, convention)[..., :n]


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------


def error_counts(tx_bits: Array, rx_bits: Array):
    """Raw (bit_errors, frame_errors, num_bits, num_frames) as scalars.

    Counts (not rates) so multi-chip evaluation can `psum` them exactly
    before dividing — the TPU-native replacement for the reference's
    per-trial Python accumulation (``utils/channel.py:156-190``).
    """
    errs = (tx_bits != rx_bits).astype(jnp.float32)
    bit_errors = errs.sum()
    frame_errors = (errs.sum(axis=-1) > 0).astype(jnp.float32).sum()
    num_bits = jnp.asarray(errs.size, dtype=jnp.float32)
    num_frames = jnp.asarray(errs.shape[0] if errs.ndim > 1 else 1, dtype=jnp.float32)
    return bit_errors, frame_errors, num_bits, num_frames


def compute_ber_fer(tx_bits: Array, rx_bits: Array):
    """(BER, FER) means — API parity with reference ``compute_ber_fer``."""
    be, fe, nb, nf = error_counts(tx_bits, rx_bits)
    return be / nb, fe / nf


@partial(jax.jit, static_argnames=("num_frames",))
def theoretical_qpsk_ber(snr_db, num_frames: int = 0):
    """Uncoded QPSK BER bound overlay 0.5*exp(-snr) (plot parity with
    ``visualization/plot_comparison.py:69-75``)."""
    return 0.5 * jnp.exp(-snr_db_to_linear(snr_db))
