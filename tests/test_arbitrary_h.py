"""Arbitrary (non-QC) parity-check matrix support.

Capability parity with the reference decoders, which accept any dense H
(`traditional_decoders.py:17-40`, `message_gnn_decoder.py:363`): here a
dense H is wrapped as a Z=1 base graph and decoded through the normal QC
plan path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import base_graph_from_H, expand_base_matrix
from ldpc_tpu.models.classical import decode_bp, decode_min_sum
from ldpc_tpu.models.message_gnn import (
    create_corrected_minsum_gnn_decoder,
    create_message_gnn_decoder,
)
from ldpc_tpu.ops import qc_msg

from golden import golden_message_passing


def random_nonqc_H(rng, m=10, n=20, row_w=4):
    """Random binary H with row weight ~row_w and min column weight 2."""
    H = np.zeros((m, n), dtype=np.int8)
    for i in range(m):
        H[i, rng.choice(n, size=row_w, replace=False)] = 1
    for j in range(n):  # ensure every variable participates in >= 2 checks
        while H[:, j].sum() < 2:
            H[rng.integers(m), j] = 1
    return H


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    H = random_nonqc_H(rng)
    return H, qc_msg.plan_from_H(H), rng


class TestBaseGraphFromH:
    def test_roundtrip(self, setup):
        H, _, _ = setup
        bg = base_graph_from_H(H)
        assert bg.shifts.shape == H.shape
        np.testing.assert_array_equal(expand_base_matrix(bg, 1), H)

    def test_rejects_nonbinary(self):
        with pytest.raises(ValueError):
            base_graph_from_H(np.array([[0, 2], [1, 0]]))

    def test_rejects_bad_ndim(self):
        with pytest.raises(ValueError):
            base_graph_from_H(np.zeros(4))


class TestClassicalOnArbitraryH:
    @pytest.mark.parametrize("iters", [1, 4])
    def test_minsum_matches_golden(self, setup, iters):
        H, plan, rng = setup
        llr = rng.normal(size=(4, H.shape[1])).astype(np.float32) * 3
        got = decode_min_sum(jnp.asarray(llr), plan, iters, 0.75)
        want = golden_message_passing(H, llr, iters, "minsum", alpha=0.75)
        np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-5, atol=1e-5)

    def test_bp_matches_golden(self, setup):
        H, plan, rng = setup
        llr = rng.normal(size=(4, H.shape[1])).astype(np.float32) * 2
        got = decode_bp(jnp.asarray(llr), plan, 3)
        want = golden_message_passing(H, llr, 3, "sumproduct")
        np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-3, atol=1e-3)


class TestNeuralOnArbitraryH:
    def test_message_gnn_forward(self, setup):
        H, plan, _ = setup
        model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
        llr = jnp.ones((3, H.shape[1]))
        params = model.init(jax.random.PRNGKey(0), llr, plan)
        soft, _ = model.apply(params, llr, plan)
        assert soft.shape == (3, H.shape[1])
        assert bool(jnp.isfinite(soft).all())

    def test_corrected_gnn_untrained_equals_minsum(self, setup):
        """Zero-init corrections => the untrained corrected GNN IS scaled
        min-sum (alpha = its 0.8 init), also on a non-QC code."""
        H, plan, rng = setup
        iters = 4
        model = create_corrected_minsum_gnn_decoder(plan, num_iterations=iters, hidden_dim=8)
        llr_np = rng.normal(size=(4, H.shape[1])).astype(np.float32) * 3
        llr = jnp.asarray(llr_np)
        params = model.init(jax.random.PRNGKey(1), llr, plan)
        soft, _ = model.apply(params, llr, plan)

        llr_cz = qc_msg.llr_to_cz(llr, plan)
        edge_llr = llr_cz[plan.edge_col]
        v2c = edge_llr
        for _ in range(iters):
            c2v = qc_msg.check_update_minsum(v2c, plan, alpha=0.8)
            v2c = qc_msg.col_sum(c2v, plan)[plan.edge_col] - c2v + edge_llr
        expect = jax.nn.sigmoid(-qc_msg.cz_to_llr(llr_cz + qc_msg.col_sum(c2v, plan)))
        np.testing.assert_array_equal(np.asarray(soft), np.asarray(expect))
