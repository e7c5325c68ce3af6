"""GF(2) systematic encoder derived from the parity-check matrix.

The reference has **no encoder**: it evaluates on the all-zero codeword
(`trainer.py:231`, `comparative_evaluation.py:133`) and its one example
rejection-samples valid codewords on a toy graph
(`examples/run_message_gnn.py:83-127`).  All-zero evaluation is only valid
for decoders with sign symmetry (classical BP/min-sum and the neural
min-sum family); the message-GNN is *not* sign-symmetric, so a GNN trained
on zero codewords can degenerate to "always output zeros" and look perfect.
This module provides the honest alternative: random-codeword generation via
a systematic generator matrix obtained by GF(2) elimination of H.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class Encoder:
    """Systematic GF(2) encoder: info bits (k,) -> codeword (n,)."""

    generator: np.ndarray  # (k, n) uint8, G H^T = 0
    info_cols: np.ndarray  # (k,) columns of H carrying the information bits

    @property
    def k(self) -> int:
        return self.generator.shape[0]

    @property
    def n(self) -> int:
        return self.generator.shape[1]

    def encode(self, info_bits: Array) -> Array:
        """(..., k) info bits -> (..., n) codewords (mod-2 matmul)."""
        G = jnp.asarray(self.generator, jnp.float32)
        return jnp.mod(info_bits.astype(jnp.float32) @ G, 2.0)

    def random_codewords(self, key: Array, batch: int) -> Array:
        info = jax.random.bernoulli(key, 0.5, (batch, self.k)).astype(jnp.float32)
        return self.encode(info)


def encoder_from_H(H: np.ndarray) -> Encoder:
    """Build a systematic encoder by GF(2) Gaussian elimination of H.

    Finds m' pivot columns (m' = rank of H), leaving k = n - m' free
    columns as information positions; each generator row is the codeword
    with a single 1 in one free position and parity bits solved from the
    reduced system.
    """
    H = (np.asarray(H) % 2).astype(np.uint8)
    m, n = H.shape
    R = H.copy()
    pivot_cols: list[int] = []
    r = 0
    for c in range(n):
        if r >= m:
            break
        rows = np.nonzero(R[r:, c])[0]
        if rows.size == 0:
            continue
        pr = r + rows[0]
        if pr != r:
            R[[r, pr]] = R[[pr, r]]
        # eliminate c from every other row
        mask = R[:, c].copy()
        mask[r] = 0
        R[mask == 1] ^= R[r]
        pivot_cols.append(c)
        r += 1
    rank = r
    R = R[:rank]
    pivots = np.array(pivot_cols, dtype=np.int64)
    free = np.setdiff1d(np.arange(n), pivots)
    k = free.size

    # For each free column f: codeword with bit f = 1 and pivot bits solved:
    # pivot row i gives x[pivots[i]] = R[i, f] (since R is reduced).
    G = np.zeros((k, n), dtype=np.uint8)
    G[np.arange(k), free] = 1
    G[:, pivots] = R[:, free].T  # (k, rank)
    # sanity: G H^T == 0
    if np.any((G @ H.T) % 2):
        raise AssertionError("encoder construction failed: G H^T != 0")
    return Encoder(generator=G, info_cols=free)
