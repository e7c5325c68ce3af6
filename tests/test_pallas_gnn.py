"""Fused message-GNN inference kernel vs the Flax module (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.message_gnn import create_message_gnn_decoder
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder, make_fused_gnn_decoder_v2
from ldpc_tpu.utils import bpsk_awgn_llr


def _trained_like_params(model, llr, plan, seed):
    """Init then perturb: zero-init projections would hide aggregation bugs."""
    params = model.init(jax.random.PRNGKey(seed), llr, plan)
    leaves, tree = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), len(leaves))
    leaves = [
        leaf + 0.05 * jax.random.normal(k, leaf.shape, leaf.dtype)
        for leaf, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(tree, leaves)


@pytest.mark.parametrize("name,Z,inject,share", [
    ("toy_4x8", 4, False, False),
    ("toy_4x8", 4, True, False),
    ("toy_4x8", 8, True, True),
    ("nr_2_0_4", 4, True, False),
])
def test_matches_flax_module(name, Z, inject, share):
    qc = qc_layout(get_base_graph(name), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    iters, h = 3, 16
    model = create_message_gnn_decoder(
        plan, num_iterations=iters, hidden_dim=h,
        input_injection=inject, share_layers=share,
    )
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((4, n)), 2.0)
    params = _trained_like_params(model, llr, plan, seed=3)
    soft_ref, _ = model.apply(params, llr, plan)

    fused = make_fused_gnn_decoder(
        qc, params, num_iterations=iters, hidden_dim=h,
        share_layers=share, input_injection=inject, interpret=True,
    )
    soft = fused(llr)
    a, b = np.asarray(soft), np.asarray(soft_ref)
    # bf16 compute with different op orders (type embeddings folded into f32
    # bias columns in the kernel): loose numeric tolerance, and strict
    # decision agreement wherever the module itself is confident (random
    # perturbed params put many soft values at ~0.5, where bf16 order noise
    # legitimately flips the comparison).
    np.testing.assert_allclose(a, b, atol=3e-2)
    confident = np.abs(b - 0.5) > 0.05
    assert confident.mean() > 0.5  # the check below must actually bite
    assert ((a > 0.5) == (b > 0.5))[confident].all()


@pytest.mark.parametrize("name,Z,inject,share", [
    ("toy_4x8", 4, False, False),
    ("toy_4x8", 4, True, False),
    ("toy_4x8", 8, True, True),
    ("nr_2_0_4", 4, True, False),
])
def test_v2_matches_flax_module(name, Z, inject, share):
    """Edge-batched-matmul kernel: same parity gate as the v1 kernel."""
    qc = qc_layout(get_base_graph(name), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    iters, h = 3, 16
    model = create_message_gnn_decoder(
        plan, num_iterations=iters, hidden_dim=h,
        input_injection=inject, share_layers=share,
    )
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((4, n)), 2.0)
    params = _trained_like_params(model, llr, plan, seed=3)
    soft_ref, _ = model.apply(params, llr, plan)

    fused = make_fused_gnn_decoder_v2(
        qc, params, num_iterations=iters, hidden_dim=h,
        share_layers=share, input_injection=inject, mm_group=3, interpret=True,
    )
    soft = fused(llr)
    a, b = np.asarray(soft), np.asarray(soft_ref)
    np.testing.assert_allclose(a, b, atol=3e-2)
    confident = np.abs(b - 0.5) > 0.05
    assert confident.mean() > 0.5
    assert ((a > 0.5) == (b > 0.5))[confident].all()


def test_v2_matches_v1_kernel():
    """v1 and v2 are the same serving computation re-tiled: near-identical."""
    qc = qc_layout(get_base_graph("nr_2_0_4"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = create_message_gnn_decoder(plan, num_iterations=4, hidden_dim=16,
                                       input_injection=True)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(2), jnp.zeros((4, n)), 1.0)
    params = _trained_like_params(model, llr, plan, seed=9)
    kw = dict(num_iterations=4, hidden_dim=16, input_injection=True, interpret=True)
    v1 = make_fused_gnn_decoder(qc, params, **kw)(llr)
    v2 = make_fused_gnn_decoder_v2(qc, params, **kw)(llr)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=2e-2)


@pytest.mark.parametrize("name,Z,inject,share", [
    ("toy_4x8", 4, False, False),
    ("toy_4x8", 4, True, False),
    ("toy_4x8", 8, True, True),
    ("nr_2_0_4", 4, True, False),
])
def test_v3_matches_flax_module(name, Z, inject, share):
    """Element-count-reduced kernel (te in the feature stream, folded
    biases, whole-graph matmuls): same parity gate as v1/v2."""
    from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder_v3

    qc = qc_layout(get_base_graph(name), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    iters, h = 3, 16
    model = create_message_gnn_decoder(
        plan, num_iterations=iters, hidden_dim=h,
        input_injection=inject, share_layers=share,
    )
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((4, n)), 2.0)
    params = _trained_like_params(model, llr, plan, seed=3)
    soft_ref, _ = model.apply(params, llr, plan)

    fused = make_fused_gnn_decoder_v3(
        qc, params, num_iterations=iters, hidden_dim=h,
        share_layers=share, input_injection=inject, interpret=True,
    )
    soft = fused(llr)
    a, b = np.asarray(soft), np.asarray(soft_ref)
    np.testing.assert_allclose(a, b, atol=3e-2)
    confident = np.abs(b - 0.5) > 0.05
    assert confident.mean() > 0.5
    assert ((a > 0.5) == (b > 0.5))[confident].all()


def test_v3_single_iteration_and_residual_algebra():
    """T=1 (peeled path only) and T=2 (one residual step) exercise the
    te-delta bookkeeping: block 1 is the FULL te_1 for the unresidualed
    iteration-0 writeback, later blocks are deltas carried by the stream."""
    from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder_v3

    qc = qc_layout(get_base_graph("toy_4x8"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    for iters in (1, 2):
        model = create_message_gnn_decoder(plan, num_iterations=iters,
                                           hidden_dim=16)
        llr = bpsk_awgn_llr(jax.random.PRNGKey(4), jnp.zeros((4, n)), 2.0)
        params = _trained_like_params(model, llr, plan, seed=7)
        soft_ref, _ = model.apply(params, llr, plan)
        fused = make_fused_gnn_decoder_v3(qc, params, num_iterations=iters,
                                          hidden_dim=16, interpret=True)
        np.testing.assert_allclose(
            np.asarray(fused(llr)), np.asarray(soft_ref), atol=3e-2
        )


@pytest.mark.parametrize("name,Z,inject,share", [
    ("toy_4x8", 4, False, False),
    ("toy_4x8", 4, True, False),
    ("toy_4x8", 8, True, True),
    ("nr_2_0_4", 4, True, False),
])
def test_v4_matches_flax_module(name, Z, inject, share):
    """Group-wise hybrid kernel (v3 folds + v2 group tiling + thin
    last-iteration fold): same parity gate as v1/v2/v3."""
    from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder_v4

    qc = qc_layout(get_base_graph(name), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    iters, h = 3, 16
    model = create_message_gnn_decoder(
        plan, num_iterations=iters, hidden_dim=h,
        input_injection=inject, share_layers=share,
    )
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((4, n)), 2.0)
    params = _trained_like_params(model, llr, plan, seed=3)
    soft_ref, _ = model.apply(params, llr, plan)

    fused = make_fused_gnn_decoder_v4(
        qc, params, num_iterations=iters, hidden_dim=h,
        share_layers=share, input_injection=inject, interpret=True,
    )
    soft = fused(llr)
    a, b = np.asarray(soft), np.asarray(soft_ref)
    np.testing.assert_allclose(a, b, atol=3e-2)
    confident = np.abs(b - 0.5) > 0.05
    assert confident.mean() > 0.5
    assert ((a > 0.5) == (b > 0.5))[confident].all()


@pytest.mark.parametrize("iters", [1, 2, 3, 5])
def test_v4_short_and_long_iteration_counts(iters):
    """T=1 (thin fold only, no residual), T=2 (both peels, no fori_loop),
    T=3/5 (full path) exercise every control-flow combination of the
    peeled-first / fori-mid / thin-folded-last structure."""
    from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder_v4

    qc = qc_layout(get_base_graph("toy_4x8"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = create_message_gnn_decoder(plan, num_iterations=iters,
                                       hidden_dim=16, input_injection=True)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(4), jnp.zeros((4, n)), 2.0)
    params = _trained_like_params(model, llr, plan, seed=7)
    soft_ref, _ = model.apply(params, llr, plan)
    fused = make_fused_gnn_decoder_v4(qc, params, num_iterations=iters,
                                      hidden_dim=16, input_injection=True,
                                      interpret=True)
    np.testing.assert_allclose(
        np.asarray(fused(llr)), np.asarray(soft_ref), atol=3e-2
    )


def test_v4_matches_v1_kernel_z32():
    """v4 and v1 agree at the production Z=32 packed layout."""
    from ldpc_tpu.ops.pallas_gnn import (
        make_fused_gnn_decoder,
        make_fused_gnn_decoder_v4,
    )

    qc = qc_layout(get_base_graph("toy_4x8"), 32)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=16,
                                       input_injection=True)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(2), jnp.zeros((4, n)), 2.0)
    params = _trained_like_params(model, llr, plan, seed=11)
    kw = dict(num_iterations=2, hidden_dim=16, input_injection=True,
              interpret=True)
    v1 = make_fused_gnn_decoder(qc, params, **kw)(llr)
    v4 = make_fused_gnn_decoder_v4(qc, params, **kw)(llr)
    np.testing.assert_allclose(np.asarray(v4), np.asarray(v1), atol=2e-2)


def test_untrained_is_channel_passthrough():
    """Zero-init output projection: fused kernel returns sigmoid(-llr)."""
    qc = qc_layout(get_base_graph("toy_4x8"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(5), jnp.zeros((3, n)), 3.0)
    params = model.init(jax.random.PRNGKey(6), llr, plan)
    fused = make_fused_gnn_decoder(qc, params, num_iterations=2, hidden_dim=8,
                                   interpret=True)
    np.testing.assert_allclose(
        np.asarray(fused(llr)), np.asarray(jax.nn.sigmoid(-llr)), atol=1e-6
    )


class TestCorrectedServing:
    """Serving kernel for the flagship corrected decoder."""

    def _setup(self, name="toy_4x8", Z=4, iters=3, h=16, inject=True):
        from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder

        qc = qc_layout(get_base_graph(name), Z)
        plan = qc_msg.make_plan(qc)
        n = plan.C * plan.Z
        model = create_corrected_minsum_gnn_decoder(
            plan, num_iterations=iters, hidden_dim=h, input_injection=inject
        )
        llr = bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((4, n)), 1.0)
        return qc, plan, n, model, llr

    def test_zero_init_is_exact_minsum(self):
        """Untrained params: the kernel IS classical scaled min-sum (the
        corrections are exactly zero), bit-for-bit vs the XLA decoder."""
        from ldpc_tpu.models.classical import decode_min_sum
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder

        qc, plan, n, model, llr = self._setup(iters=4)
        params = model.init(jax.random.PRNGKey(2), llr, plan)
        fused = make_fused_corrected_gnn_decoder(
            qc, params, num_iterations=4, hidden_dim=16, interpret=True
        )
        soft = fused(llr)
        # manual fixed-iteration min-sum, alpha = the 0.8 init
        llr_cz = qc_msg.llr_to_cz(llr, plan)
        edge = llr_cz[plan.edge_col]
        v2c = edge
        for _ in range(4):
            c2v = qc_msg.check_update_minsum(v2c, plan, alpha=0.8)
            v2c = qc_msg.col_sum(c2v, plan)[plan.edge_col] - c2v + edge
        expect = jax.nn.sigmoid(-qc_msg.cz_to_llr(llr_cz + qc_msg.col_sum(c2v, plan)))
        np.testing.assert_allclose(np.asarray(soft), np.asarray(expect), atol=1e-5)

    @pytest.mark.parametrize("inject", [False, True])
    def test_matches_flax_module(self, inject):
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder

        qc, plan, n, model, llr = self._setup(inject=inject)
        params = _trained_like_params(model, llr, plan, seed=9)
        soft_ref, _ = model.apply(params, llr, plan)
        fused = make_fused_corrected_gnn_decoder(
            qc, params, num_iterations=3, hidden_dim=16,
            input_injection=inject, interpret=True,
        )
        a, b = np.asarray(fused(llr)), np.asarray(soft_ref)
        np.testing.assert_allclose(a, b, atol=3e-2)
        confident = np.abs(b - 0.5) > 0.05
        assert confident.mean() > 0.5
        assert ((a > 0.5) == (b > 0.5))[confident].all()

    @pytest.mark.parametrize("Z", [4, 32])
    def test_early_exit_zero_init_matches_minsum_early_exit(self, Z):
        """Zero-init corrections + early_exit: identical hard decisions to
        the fused min-sum kernel with the same alpha and freezing rule.
        Z=32 exercises the Bt=4 packing (the production code's layout)."""
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum

        qc, plan, n, model, _ = self._setup(Z=Z, iters=8)
        llr = bpsk_awgn_llr(jax.random.PRNGKey(7), jnp.zeros((8, n)), 2.0)
        params = model.init(jax.random.PRNGKey(8), llr, plan)
        fused = make_fused_corrected_gnn_decoder(
            qc, params, num_iterations=8, hidden_dim=16,
            early_exit=True, interpret=True,
        )
        ms = make_fused_minsum(qc, 8, 0.8, early_exit=True, interpret=True)
        got = np.asarray(fused(llr)) > 0.5
        want = np.asarray(ms(llr)[0]) > 0.5
        np.testing.assert_array_equal(got, want)

    def test_return_iterations_matches_minsum_conv(self):
        """Zero-init + return_iterations: per-frame convergence iterations
        equal the fused min-sum kernel's conv output."""
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum

        qc, plan, n, model, _ = self._setup(iters=8)
        llr = bpsk_awgn_llr(jax.random.PRNGKey(17), jnp.zeros((8, n)), 2.0)
        params = model.init(jax.random.PRNGKey(18), llr, plan)
        fused = make_fused_corrected_gnn_decoder(
            qc, params, num_iterations=8, hidden_dim=16,
            early_exit=True, return_iterations=True, interpret=True,
        )
        ms = make_fused_minsum(qc, 8, 0.8, early_exit=True, interpret=True)
        soft, conv = fused(llr)
        bits_ms, conv_ms = ms(llr)
        np.testing.assert_array_equal(np.asarray(soft) > 0.5, np.asarray(bits_ms) > 0.5)
        np.testing.assert_array_equal(np.asarray(conv), np.asarray(conv_ms))

    def test_early_exit_agrees_at_high_snr(self):
        """Trained-like params at high SNR: every frame converges, and the
        early-exit decisions match the fixed-T kernel's decisions."""
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder

        qc, plan, n, model, _ = self._setup(iters=3)
        llr = bpsk_awgn_llr(jax.random.PRNGKey(12), jnp.zeros((8, n)), 6.0)
        params = _trained_like_params(model, llr, plan, seed=13)
        kw = dict(num_iterations=3, hidden_dim=16, interpret=True)
        fixed = make_fused_corrected_gnn_decoder(qc, params, **kw)
        early = make_fused_corrected_gnn_decoder(qc, params, early_exit=True, **kw)
        np.testing.assert_array_equal(
            np.asarray(early(llr)) > 0.5, np.asarray(fixed(llr)) > 0.5
        )

    def test_matches_flax_module_z24(self):
        """Z = 24: the Bt = 1 padded-lane layout (lanes = 128 > Z).  Regression
        for the _roll_lanes padding splice bug (padding lanes must pass
        through the circulant rotation, not enter the cyclic group)."""
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder

        qc, plan, n, model, llr = self._setup(Z=24, iters=2, h=16)
        params = _trained_like_params(model, llr, plan, seed=21)
        soft_ref, _ = model.apply(params, llr, plan)
        fused = make_fused_corrected_gnn_decoder(
            qc, params, num_iterations=2, hidden_dim=16, interpret=True,
        )
        a, b = np.asarray(fused(llr)), np.asarray(soft_ref)
        np.testing.assert_allclose(a, b, atol=3e-2)
        confident = np.abs(b - 0.5) > 0.05
        assert confident.mean() > 0.5
        assert ((a > 0.5) == (b > 0.5))[confident].all()

    def test_matches_flax_module_z32(self):
        """Z = 32 (the production NR code's lifting, Bt = 4 lane packing) —
        guards the layout the Z=32 flagship serving path runs on."""
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder

        qc, plan, n, model, llr = self._setup(Z=32, iters=2, h=16)
        params = _trained_like_params(model, llr, plan, seed=11)
        soft_ref, _ = model.apply(params, llr, plan)
        fused = make_fused_corrected_gnn_decoder(
            qc, params, num_iterations=2, hidden_dim=16, interpret=True,
        )
        a, b = np.asarray(fused(llr)), np.asarray(soft_ref)
        np.testing.assert_allclose(a, b, atol=3e-2)
        confident = np.abs(b - 0.5) > 0.05
        assert confident.mean() > 0.5
        assert ((a > 0.5) == (b > 0.5))[confident].all()


def test_batch_padding():
    qc = qc_layout(get_base_graph("toy_4x8"), 4)  # Bt = 32
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(7), jnp.zeros((5, n)), 3.0)
    params = model.init(jax.random.PRNGKey(8), llr, plan)
    fused = make_fused_gnn_decoder(qc, params, num_iterations=2, hidden_dim=8,
                                   interpret=True)
    assert fused(llr).shape == (5, n)


def test_multi_tile_batch():
    """Batch spanning several grid tiles (nt > 1): the per-tile row block is
    padded to a sublane multiple (C=52 is not divisible by 8 — regression
    test for the Mosaic block-shape requirement that only bites at nt > 1)."""
    from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder
    from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder

    qc = qc_layout(get_base_graph("nr_2_0_4"), 4)  # Bt = 32 per tile
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = create_corrected_minsum_gnn_decoder(plan, num_iterations=2,
                                                hidden_dim=8, input_injection=True)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(9), jnp.zeros((80, n)), 2.0)  # nt=3
    params = model.init(jax.random.PRNGKey(1), llr[:2], plan)
    soft_ref, _ = model.apply(params, llr, plan)
    fused = make_fused_corrected_gnn_decoder(qc, params, num_iterations=2,
                                             hidden_dim=8, input_injection=True,
                                             interpret=True)
    soft = fused(llr)
    assert soft.shape == (80, n)
    np.testing.assert_allclose(np.asarray(soft), np.asarray(soft_ref), atol=3e-2)
    # zero-init corrections = exact min-sum: every tile must agree, which
    # fails if tile boundaries mis-slice the padded rows
    batch1 = fused(llr[:1])
    np.testing.assert_allclose(np.asarray(soft[:1]), np.asarray(batch1), atol=1e-6)


class TestCorrectedServingV2:
    """Element-count-reduced corrected serving kernel (v2): same gates as
    the v1 kernel — zero-init exactness, module parity, early exit."""

    def _setup(self, name="toy_4x8", Z=4, iters=3, h=16, inject=True):
        from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder

        qc = qc_layout(get_base_graph(name), Z)
        plan = qc_msg.make_plan(qc)
        n = plan.C * plan.Z
        model = create_corrected_minsum_gnn_decoder(
            plan, num_iterations=iters, hidden_dim=h, input_injection=inject
        )
        llr = bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((4, n)), 1.0)
        return qc, plan, n, model, llr

    def test_zero_init_is_exact_minsum(self):
        """Zero corrections: w2p = pw^T W2 = 0 and cconst = 0, so the thin
        folded projection is exactly zero and the f32 min-sum skeleton is
        bit-exact."""
        from ldpc_tpu.models.classical import decode_min_sum  # noqa: F401
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2

        qc, plan, n, model, llr = self._setup(iters=4)
        params = model.init(jax.random.PRNGKey(2), llr, plan)
        fused = make_fused_corrected_gnn_decoder_v2(
            qc, params, num_iterations=4, hidden_dim=16, interpret=True
        )
        soft = fused(llr)
        llr_cz = qc_msg.llr_to_cz(llr, plan)
        edge = llr_cz[plan.edge_col]
        v2c = edge
        for _ in range(4):
            c2v = qc_msg.check_update_minsum(v2c, plan, alpha=0.8)
            v2c = qc_msg.col_sum(c2v, plan)[plan.edge_col] - c2v + edge
        expect = jax.nn.sigmoid(-qc_msg.cz_to_llr(llr_cz + qc_msg.col_sum(c2v, plan)))
        np.testing.assert_allclose(np.asarray(soft), np.asarray(expect), atol=1e-5)

    @pytest.mark.parametrize("inject", [False, True])
    def test_matches_flax_module(self, inject):
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2

        qc, plan, n, model, llr = self._setup(inject=inject)
        params = _trained_like_params(model, llr, plan, seed=9)
        soft_ref, _ = model.apply(params, llr, plan)
        fused = make_fused_corrected_gnn_decoder_v2(
            qc, params, num_iterations=3, hidden_dim=16,
            input_injection=inject, interpret=True,
        )
        a, b = np.asarray(fused(llr)), np.asarray(soft_ref)
        np.testing.assert_allclose(a, b, atol=3e-2)
        confident = np.abs(b - 0.5) > 0.05
        assert confident.mean() > 0.5
        assert ((a > 0.5) == (b > 0.5))[confident].all()

    def test_matches_flax_module_h64(self):
        """Production hidden size: v2 folds the projection (w2p) and
        constant (cconst) into bfloat16 while the v1 kernel applied them in
        f32 — gate parity at h=64, not just the h=16 toy shapes, so
        precision drift in the fold can't hide (ADVICE r3)."""
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2

        qc, plan, n, model, llr = self._setup(Z=32, iters=2, h=64)
        params = _trained_like_params(model, llr, plan, seed=13)
        soft_ref, _ = model.apply(params, llr, plan)
        fused = make_fused_corrected_gnn_decoder_v2(
            qc, params, num_iterations=2, hidden_dim=64, interpret=True
        )
        a, b = np.asarray(fused(llr)), np.asarray(soft_ref)
        np.testing.assert_allclose(a, b, atol=3e-2)
        confident = np.abs(b - 0.5) > 0.05
        assert confident.mean() > 0.5
        assert ((a > 0.5) == (b > 0.5))[confident].all()

    def test_matches_v1_kernel_z32(self):
        """v1 and v2 corrected kernels agree at the production Z=32 layout
        (Bt=4 packing) with trained-like params."""
        from ldpc_tpu.ops.pallas_gnn import (
            make_fused_corrected_gnn_decoder,
            make_fused_corrected_gnn_decoder_v2,
        )

        qc, plan, n, model, llr = self._setup(Z=32, iters=2, h=16)
        params = _trained_like_params(model, llr, plan, seed=11)
        kw = dict(num_iterations=2, hidden_dim=16, interpret=True)
        v1 = make_fused_corrected_gnn_decoder(qc, params, **kw)(llr)
        v2 = make_fused_corrected_gnn_decoder_v2(qc, params, **kw)(llr)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), atol=2e-2)

    def test_early_exit_zero_init_matches_minsum_early_exit(self):
        from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum

        qc, plan, n, model, _ = self._setup(iters=8)
        llr = bpsk_awgn_llr(jax.random.PRNGKey(7), jnp.zeros((8, n)), 2.0)
        params = model.init(jax.random.PRNGKey(8), llr, plan)
        fused = make_fused_corrected_gnn_decoder_v2(
            qc, params, num_iterations=8, hidden_dim=16,
            early_exit=True, return_iterations=True, interpret=True,
        )
        ms = make_fused_minsum(qc, 8, 0.8, early_exit=True, interpret=True)
        soft, conv = fused(llr)
        bits_ms, conv_ms = ms(llr)
        np.testing.assert_array_equal(np.asarray(soft) > 0.5,
                                      np.asarray(bits_ms) > 0.5)
        np.testing.assert_array_equal(np.asarray(conv), np.asarray(conv_ms))
