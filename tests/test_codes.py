"""Unit tests for base graphs, QC lifting, and edge layouts.

Golden values follow the reference semantics: the canonical 3x4 H and its
edge-index tables (reference notebook cells 5/7 and ``utils/ldpc_utils.py``),
and lifting per ``ldpc_utils.py:97-125``.
"""
import numpy as np
import pytest

from ldpc_tpu.codes import (
    BaseGraph,
    edge_layout_from_H,
    expand_base_matrix,
    get_base_graph,
    qc_layout,
)

H34 = np.array(
    [
        [1, 1, 0, 0],
        [0, 1, 1, 1],
        [1, 0, 0, 1],
    ]
)


class TestFlatEdgeLayout:
    def test_edge_enumeration_order(self):
        lay = edge_layout_from_H(H34)
        # Sorted by (var, check): the reference's row-major H^T order.
        assert lay.num_edges == 7
        np.testing.assert_array_equal(lay.edge_var, [0, 0, 1, 1, 2, 3, 3])
        np.testing.assert_array_equal(lay.edge_check, [0, 2, 0, 1, 1, 1, 2])

    def test_check_neighbor_table(self):
        lay = edge_layout_from_H(H34)
        expected = np.array(
            [
                [2, -1],
                [6, -1],
                [0, -1],
                [4, 5],
                [3, 5],
                [3, 4],
                [1, -1],
            ]
        )
        np.testing.assert_array_equal(lay.check_nbr, expected)

    def test_var_neighbor_table(self):
        lay = edge_layout_from_H(H34)
        expected = np.array(
            [
                [1],
                [0],
                [3],
                [2],
                [-1],
                [6],
                [5],
            ]
        )
        np.testing.assert_array_equal(lay.var_nbr, expected)

    def test_output_index_is_edge_var(self):
        lay = edge_layout_from_H(H34)
        np.testing.assert_array_equal(lay.output_index, lay.edge_var)


class TestLifting:
    def test_identity_shift_zero(self):
        bg = BaseGraph("t", np.array([[0]]))
        np.testing.assert_array_equal(expand_base_matrix(bg, 3), np.eye(3, dtype=np.int8))

    def test_shift_direction(self):
        # Shift s: H[r*Z + i, c*Z + (i+s) % Z] = 1  (torch.roll(I, s, dims=1)).
        bg = BaseGraph("t", np.array([[1]]))
        H = expand_base_matrix(bg, 4)
        expect = np.zeros((4, 4), dtype=np.int8)
        for i in range(4):
            expect[i, (i + 1) % 4] = 1
        np.testing.assert_array_equal(H, expect)

    def test_minus_one_is_zero_block(self):
        bg = BaseGraph("t", np.array([[-1, 2]]))
        H = expand_base_matrix(bg, 4)
        assert H[:, :4].sum() == 0
        assert H[:, 4:].sum() == 4

    def test_nr_bg2_envelope(self):
        bg = get_base_graph("nr_2_0_32")
        H = expand_base_matrix(bg, 32)
        assert H.shape == (1344, 1664)
        assert int(H.sum()) == 6304  # edge count from SURVEY.md §2 row 36
        lay = edge_layout_from_H(H)
        assert lay.check_nbr.shape[1] == 10 - 1  # max check degree 10
        assert lay.var_nbr.shape[1] == 23 - 1  # max var degree 23


class TestQCLayout:
    @pytest.mark.parametrize("name,Z", [("toy_4x8", 4), ("nr_2_0_4", 4), ("nr_2_0_32", 8)])
    def test_edges_match_dense_H(self, name, Z):
        bg = get_base_graph(name)
        qc = qc_layout(bg, Z)
        H = expand_base_matrix(bg, Z)
        # var-aligned (k, z): var = (edge_col, z), check = (edge_row, (z - s) % Z)
        K = qc.num_base_edges
        assert qc.num_edges == int(H.sum())
        for k in range(K):
            for z in range(Z):
                v = qc.edge_col[k] * Z + z
                c = qc.edge_row[k] * Z + (z - qc.edge_shift[k]) % Z
                assert H[c, v] == 1

    def test_row_gather_var_roundtrip(self):
        bg = get_base_graph("toy_4x8")
        Z = 4
        qc = qc_layout(bg, Z)
        K = qc.num_base_edges
        rng = np.random.default_rng(1)
        msg_var = rng.normal(size=(K, Z))
        padded = np.concatenate([msg_var.ravel(), [0.0]])
        grouped = padded[qc.row_gather_var]  # (R, dr_max, Z) check-aligned
        # grouped[r, slot, z_r] must be the message of edge row_edges[r,slot]
        # at var lane (z_r + shift) % Z
        for r in range(qc.num_base_rows):
            for slot in range(qc.dr_max):
                k = qc.row_edges[r, slot]
                for zr in range(Z):
                    if k == K:
                        assert grouped[r, slot, zr] == 0.0
                    else:
                        zc = (zr + qc.edge_shift[k]) % Z
                        assert grouped[r, slot, zr] == msg_var[k, zc]
        # ungroup_to_var inverts the grouping+roll exactly
        back = grouped.ravel()[qc.ungroup_to_var]
        np.testing.assert_allclose(back, msg_var)

    def test_col_incidence_sums(self):
        bg = get_base_graph("toy_4x8")
        qc = qc_layout(bg, 4)
        rng = np.random.default_rng(2)
        msg = rng.normal(size=(qc.num_base_edges, 4))
        colsum = qc.col_incidence @ msg  # (C, Z)
        for c in range(qc.num_base_cols):
            ks = [k for k in range(qc.num_base_edges) if qc.edge_col[k] == c]
            np.testing.assert_allclose(colsum[c], msg[ks].sum(axis=0), rtol=1e-6)

    def test_flat_edge_id_bijection(self):
        bg = get_base_graph("nr_2_0_4")
        Z = 4
        qc = qc_layout(bg, Z)
        flat = qc.flat_edge_id_var_aligned()
        assert sorted(flat.ravel().tolist()) == list(range(qc.num_edges))
        # Flat ids must match the reference enumeration from the dense H.
        H = expand_base_matrix(bg, Z)
        lay = edge_layout_from_H(H)
        for k in range(qc.num_base_edges):
            for z in range(Z):
                e = flat[k, z]
                assert lay.edge_var[e] == qc.edge_col[k] * Z + z
                assert lay.edge_check[e] == qc.edge_row[k] * Z + (z - qc.edge_shift[k]) % Z

    def test_edge_types_are_shift_indices(self):
        bg = get_base_graph("nr_2_0_32")
        qc = qc_layout(bg, 32)
        assert qc.num_edge_types == len(bg.unique_shift_types(32))
        # Same shift -> same type, different shift -> different type
        shift_by_type = {}
        for k in range(qc.num_base_edges):
            t, s = int(qc.edge_type[k]), int(qc.edge_shift[k])
            assert shift_by_type.setdefault(t, s) == s


class TestEncoder:
    def test_codewords_satisfy_H(self, rng):
        import jax
        from ldpc_tpu.codes import encoder_from_H

        for name, Z in [("toy_4x8", 4), ("nr_2_0_4", 4)]:
            H = expand_base_matrix(get_base_graph(name), Z)
            enc = encoder_from_H(H)
            cw = enc.random_codewords(jax.random.PRNGKey(0), 16)
            syn = (np.asarray(cw) @ H.T) % 2
            assert syn.sum() == 0
            assert enc.k >= H.shape[1] - H.shape[0]
            # nonzero codewords produced (not degenerate)
            assert np.asarray(cw).sum() > 0

    def test_systematic_info_recovery(self):
        import jax
        from ldpc_tpu.codes import encoder_from_H

        H = expand_base_matrix(get_base_graph("toy_4x8"), 4)
        enc = encoder_from_H(H)
        info = jax.random.bernoulli(jax.random.PRNGKey(1), 0.5, (8, enc.k)).astype("float32")
        cw = enc.encode(info)
        np.testing.assert_array_equal(np.asarray(cw)[:, enc.info_cols], np.asarray(info))


class TestRandomGraphProperties:
    """Property tests: QC layout consistency on random base graphs."""

    @pytest.mark.parametrize("seed", range(5))
    def test_random_base_graph_layout(self, seed):
        rng = np.random.default_rng(seed)
        R, C = rng.integers(2, 7), rng.integers(3, 10)
        Z = int(rng.integers(2, 9))
        shifts = rng.integers(-1, 2 * Z, size=(R, C))
        # ensure every row and column has at least one edge
        for r in range(R):
            if (shifts[r] < 0).all():
                shifts[r, rng.integers(0, C)] = rng.integers(0, Z)
        for c in range(C):
            if (shifts[:, c] < 0).all():
                shifts[rng.integers(0, R), c] = rng.integers(0, Z)
        bg = BaseGraph(f"rand{seed}", shifts)
        qc = qc_layout(bg, Z)
        H = expand_base_matrix(bg, Z)
        assert qc.num_edges == int(H.sum())
        # var-aligned edge enumeration matches H
        for k in range(qc.num_base_edges):
            for z in range(Z):
                v = qc.edge_col[k] * Z + z
                c = qc.edge_row[k] * Z + (z - qc.edge_shift[k]) % Z
                assert H[c, v] == 1
        # roundtrip of the composed grouping gather
        msg = np.random.default_rng(seed + 100).normal(size=(qc.num_base_edges, Z))
        padded = np.concatenate([msg.ravel(), [0.0]])
        grouped = padded[qc.row_gather_var]
        back = grouped.ravel()[qc.ungroup_to_var]
        np.testing.assert_allclose(back, msg)

    def test_degenerate_graphs_rejected(self):
        with pytest.raises(ValueError, match="no edges"):
            qc_layout(BaseGraph("empty", np.full((2, 3), -1)), 4)
        with pytest.raises(ValueError, match="lifting factor"):
            qc_layout(BaseGraph("t", np.array([[0]])), 0)


def test_random_graph_golden_decode():
    """Min-sum on a random QC graph matches the scalar golden model."""
    import jax.numpy as jnp
    from ldpc_tpu.models.classical import decode_min_sum
    from ldpc_tpu.ops import qc_msg
    from golden import golden_message_passing

    rng = np.random.default_rng(7)
    shifts = rng.integers(-1, 6, size=(3, 6))
    shifts[0, 0] = 1  # ensure edges exist
    for c in range(6):
        if (shifts[:, c] < 0).all():
            shifts[rng.integers(0, 3), c] = 2
    bg = BaseGraph("rand", shifts)
    Z = 4
    qc = qc_layout(bg, Z)
    plan = qc_msg.make_plan(qc)
    H = expand_base_matrix(bg, Z)
    llr = rng.normal(size=(3, H.shape[1])).astype(np.float32) * 2
    got = decode_min_sum(jnp.asarray(llr), plan, 4, 0.75)
    want = golden_message_passing(H, llr, 4, "minsum", alpha=0.75)
    np.testing.assert_allclose(np.asarray(got.beliefs), want, rtol=1e-4, atol=1e-4)
