"""Message-GNN tests: normalized-adjacency equivalence, all hybrid modes,
training, decoding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import expand_base_matrix, get_base_graph, qc_layout
from ldpc_tpu.models.message_gnn import (
    MessageGNNDecoder,
    create_corrected_minsum_gnn_decoder,
    create_custom_check_message_gnn_decoder,
    create_custom_minsum_message_gnn_decoder,
    create_custom_variable_message_gnn_decoder,
    create_message_gnn_decoder,
)
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.training import LDPCDecoderTrainer
from ldpc_tpu.utils import channel as ch


@pytest.fixture(scope="module")
def setup():
    bg = get_base_graph("toy_4x8")
    Z = 4
    qc = qc_layout(bg, Z)
    return bg, Z, qc, expand_base_matrix(bg, Z), qc_msg.make_plan(qc)


def _dense_normalized_adjacency(groups_of_edge):
    """Reference construction (message_gnn_decoder.py:410-469): clique over
    same-group messages, + identity, D^(-1/2) A D^(-1/2)."""
    E = len(groups_of_edge)
    A = np.zeros((E, E))
    for i in range(E):
        for j in range(E):
            if i != j and groups_of_edge[i] == groups_of_edge[j]:
                A[i, j] = 1.0
    A = A + np.eye(E)
    d = A.sum(axis=1)
    dinv = np.diag(d**-0.5)
    return dinv @ A @ dinv


class TestAdjacencyEquivalence:
    """The QC group-mean aggregation must equal the reference's dense
    D^(-1/2)(A+I)D^(-1/2) aggregation exactly (SURVEY.md §7 hard part 6)."""

    @pytest.mark.parametrize("relation", ["var", "check"])
    def test_group_mean_equals_normalized_adjacency(self, setup, relation, rng):
        bg, Z, qc, H, plan = setup
        K = qc.num_base_edges
        H_feat = 3
        feats = rng.normal(size=(K, Z, 1, H_feat)).astype(np.float32)

        if relation == "var":
            got = qc_msg.var_group_mean(jnp.asarray(feats), plan)
        else:
            got = qc_msg.check_group_mean(jnp.asarray(feats), plan)

        # Flatten QC layout -> edge list keyed by (var, check)
        edges, vals, gots = [], [], []
        for k in range(K):
            for z in range(Z):
                v = qc.edge_col[k] * Z + z
                c = qc.edge_row[k] * Z + (z - qc.edge_shift[k]) % Z
                edges.append((v, c))
                vals.append(feats[k, z, 0])
                gots.append(np.asarray(got)[k, z, 0])
        groups = [v for v, _ in edges] if relation == "var" else [c for _, c in edges]
        A_norm = _dense_normalized_adjacency(groups)
        want = A_norm @ np.stack(vals)
        np.testing.assert_allclose(np.stack(gots), want, rtol=1e-5, atol=1e-6)


ALL_MODES = [("neural", "neural"), ("minsum", "neural"), ("neural", "minsum"), ("minsum", "minsum")]


class TestForward:
    @pytest.mark.parametrize("var_mode,check_mode", ALL_MODES)
    def test_forward_and_grads(self, setup, var_mode, check_mode):
        _, _, _, H, plan = setup
        n = H.shape[1]
        model = MessageGNNDecoder(
            num_iterations=2,
            hidden_dim=8,
            num_message_types=plan.num_edge_types,
            var_mode=var_mode,
            check_mode=check_mode,
        )
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((4, n)), 2.0)
        gt = jnp.zeros((4, n))
        params = model.init(jax.random.PRNGKey(1), llr, plan)
        soft, loss = model.apply(params, llr, plan, gt)
        assert soft.shape == (4, n)
        assert loss.shape == (4,)
        assert bool(jnp.isfinite(soft).all()) and bool(jnp.isfinite(loss).all())

        def loss_fn(p):
            _, l = model.apply(p, llr, plan, gt)
            return l.mean()

        g = jax.jit(jax.grad(loss_fn))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

    @pytest.mark.parametrize("factory", [create_corrected_minsum_gnn_decoder,
                                         create_message_gnn_decoder])
    def test_remat_is_transparent(self, setup, factory):
        """remat=True must not change the function: identical params tree,
        bit-identical forward, matching gradients (the only difference is
        backward-pass memory — jax.checkpoint recomputes activations)."""
        _, _, _, H, plan = setup
        n = H.shape[1]
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((4, n)), 1.0)
        gt = jnp.zeros((4, n))
        base = factory(plan, num_iterations=3, hidden_dim=8, multiloss=True)
        rmt = factory(plan, num_iterations=3, hidden_dim=8, multiloss=True,
                      remat=True)
        params = base.init(jax.random.PRNGKey(1), llr, plan)
        # same params tree: rmt can run base's params directly
        soft0, loss0 = base.apply(params, llr, plan, gt)
        soft1, loss1 = rmt.apply(params, llr, plan, gt)
        assert bool((soft0 == soft1).all()) and bool((loss0 == loss1).all())
        g0 = jax.grad(lambda p: base.apply(p, llr, plan, gt)[1].mean())(params)
        g1 = jax.grad(lambda p: rmt.apply(p, llr, plan, gt)[1].mean())(params)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_type_embedding_count(self, setup):
        _, _, qc, H, plan = setup
        model = create_message_gnn_decoder(plan, num_iterations=1, hidden_dim=8)
        llr = jnp.zeros((2, H.shape[1]))
        params = model.init(jax.random.PRNGKey(0), llr, plan)
        te = params["params"]["gnn_layer_0"]["message_type_embeddings"]
        assert te.shape[0] == plan.num_edge_types

    def test_share_layers_param_count(self, setup):
        _, _, _, H, plan = setup
        llr = jnp.zeros((2, H.shape[1]))

        def nparams(m):
            p = m.init(jax.random.PRNGKey(0), llr, plan)
            return sum(x.size for x in jax.tree_util.tree_leaves(p))

        tied = MessageGNNDecoder(num_iterations=3, hidden_dim=8,
                                 num_message_types=plan.num_edge_types, share_layers=True)
        untied = MessageGNNDecoder(num_iterations=3, hidden_dim=8,
                                   num_message_types=plan.num_edge_types, share_layers=False)
        assert nparams(tied) < nparams(untied)

    def test_decode_hard_bits(self, setup):
        _, _, _, H, plan = setup
        n = H.shape[1]
        model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(2), jnp.zeros((4, n)), 2.0)
        params = model.init(jax.random.PRNGKey(3), llr, plan)
        bits = model.decode(params, llr, plan)
        assert set(np.unique(np.asarray(bits))) <= {0.0, 1.0}

    def test_minsum_hybrid_uses_learnable_alpha(self, setup):
        _, _, _, H, plan = setup
        model = create_custom_check_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, H.shape[1])), plan)
        assert float(params["params"]["alpha"]) == pytest.approx(0.8)


class TestFactories:
    def test_all_factories_construct_and_run(self, setup):
        _, _, _, H, plan = setup
        n = H.shape[1]
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(4), jnp.zeros((2, n)), 3.0)
        for factory in (
            create_message_gnn_decoder,
            create_custom_variable_message_gnn_decoder,
            create_custom_check_message_gnn_decoder,
            create_custom_minsum_message_gnn_decoder,
            create_corrected_minsum_gnn_decoder,
        ):
            model = factory(plan, num_iterations=2, hidden_dim=8)
            params = model.init(jax.random.PRNGKey(5), llr, plan)
            soft, _ = model.apply(params, llr, plan)
            assert soft.shape == (2, n)

    def test_corrected_mode_is_exact_minsum_at_init(self, setup):
        """Zero-init corrections: the untrained corrected decoder computes
        bit-for-bit classical scaled min-sum (alpha = its 0.8 init)."""
        _, _, _, H, plan = setup
        n = H.shape[1]
        iters = 4
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(11), jnp.zeros((8, n)), 1.0)
        model = create_corrected_minsum_gnn_decoder(plan, num_iterations=iters, hidden_dim=8)
        params = model.init(jax.random.PRNGKey(12), llr, plan)
        soft, _ = model.apply(params, llr, plan)

        # Manual classical min-sum with the same fixed-iteration schedule.
        llr_cz = qc_msg.llr_to_cz(llr, plan)
        edge_llr = llr_cz[plan.edge_col]
        v2c = edge_llr
        for _ in range(iters):
            c2v = qc_msg.check_update_minsum(v2c, plan, alpha=0.8)
            v2c = qc_msg.col_sum(c2v, plan)[plan.edge_col] - c2v + edge_llr
        expect = jax.nn.sigmoid(-qc_msg.cz_to_llr(llr_cz + qc_msg.col_sum(c2v, plan)))
        np.testing.assert_array_equal(np.asarray(soft), np.asarray(expect))

    def test_corrected_mode_trains_below_minsum_loss(self, setup):
        """A few steps on the corrected model reduce loss below its (exactly
        classical min-sum) starting point — corrections receive gradient."""
        _, _, _, H, plan = setup
        model = create_corrected_minsum_gnn_decoder(plan, num_iterations=3, hidden_dim=8)
        tr = LDPCDecoderTrainer(model, plan, seed=3)
        tr.train(num_epochs=20, batch_size=32, learning_rate=3e-3,
                 snr_range=[0.0], validation_interval=100, optimizer="adam",
                 weight_decay=0.0)
        assert all(np.isfinite(tr.train_losses))
        assert np.mean(tr.train_losses[-4:]) < np.mean(tr.train_losses[:4])


class TestTraining:
    def test_gnn_trains(self, setup):
        """Training is stable and does not diverge.  (With the zero-init
        output projection the model starts as a channel pass-through, so the
        initial loss is already near its floor on this toy graph — require
        non-divergence rather than strict decrease.)"""
        _, _, _, H, plan = setup
        model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
        tr = LDPCDecoderTrainer(model, plan, seed=0)
        tr.train(num_epochs=15, batch_size=16, learning_rate=1e-3,
                 snr_range=[4.0], validation_interval=100, optimizer="adam",
                 weight_decay=0.0)
        assert all(np.isfinite(tr.train_losses))
        assert np.mean(tr.train_losses[-3:]) <= np.mean(tr.train_losses[:3]) * 1.1

    def test_full_minsum_gnn_matches_decoding_power(self, setup):
        """The full-minsum GNN variant is a working decoder out of the box."""
        _, _, _, H, plan = setup
        n = H.shape[1]
        model = create_custom_minsum_message_gnn_decoder(plan, num_iterations=6)
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(6), jnp.zeros((64, n)), 6.0)
        params = model.init(jax.random.PRNGKey(7), llr, plan)
        bits = model.decode(params, llr, plan)
        raw_errors = float((llr < 0).sum())
        assert float(bits.sum()) <= raw_errors


class TestMultiloss:
    def test_output_unchanged_loss_differs(self, setup):
        """Multiloss only changes the training signal, not decode output."""
        _, _, _, H, plan = setup
        n = H.shape[1]
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(20), jnp.zeros((4, n)), 1.0)
        gt = jnp.zeros((4, n))
        kw = dict(num_iterations=3, hidden_dim=8, input_injection=True)
        base = create_corrected_minsum_gnn_decoder(plan, **kw)
        multi = create_corrected_minsum_gnn_decoder(plan, multiloss=True, **kw)
        params = base.init(jax.random.PRNGKey(21), llr, plan)
        s1, l1 = base.apply(params, llr, plan, gt)
        s2, l2 = multi.apply(params, llr, plan, gt)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        assert not np.allclose(np.asarray(l1), np.asarray(l2))

    @pytest.mark.parametrize("factory", [create_message_gnn_decoder,
                                         create_corrected_minsum_gnn_decoder])
    def test_multiloss_trains(self, setup, factory):
        _, _, _, H, plan = setup
        model = factory(plan, num_iterations=3, hidden_dim=8, multiloss=True)
        tr = LDPCDecoderTrainer(model, plan, seed=5)
        tr.train(num_epochs=12, batch_size=32, learning_rate=3e-3,
                 snr_range=[2.0], validation_interval=100, optimizer="adam",
                 weight_decay=0.0)
        assert all(np.isfinite(tr.train_losses))
        assert np.mean(tr.train_losses[-3:]) < np.mean(tr.train_losses[:3]) * 1.05
