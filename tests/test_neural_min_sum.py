"""Neural min-sum decoder tests: classical equivalence at init, weight sharing,
loss modes, and trainability."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.classical import decode_min_sum
from ldpc_tpu.models.neural_min_sum import (
    NeuralMinSumDecoder,
    make_standard_decoder,
    make_tied_decoder,
)
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.training import LDPCDecoderTrainer
from ldpc_tpu.utils import channel as ch


@pytest.fixture(scope="module")
def plan():
    return qc_msg.make_plan(qc_layout(get_base_graph("toy_4x8"), 4))


def _init(model, plan, B=4):
    return model.init(jax.random.PRNGKey(0), jnp.zeros((B, plan.C * plan.Z)), plan)


class TestEquivalence:
    def test_matches_classical_minsum_at_unit_init(self, plan, rng):
        """With w_ch=1, no residuals, alpha=1 the neural decoder IS plain
        min-sum: soft bits must equal sigmoid(-beliefs)."""
        model = NeuralMinSumDecoder(num_iterations=4, depth_L=0, weight_sharing="scalar")
        llr = jnp.asarray(rng.normal(size=(6, plan.C * plan.Z)).astype(np.float32) * 2)
        params = _init(model, plan)
        soft, _ = model.apply(params, llr, plan)
        classical = decode_min_sum(llr, plan, 4, 1.0)
        np.testing.assert_allclose(
            np.asarray(soft), jax.nn.sigmoid(-classical.beliefs), rtol=1e-5, atol=1e-6
        )

    def test_hard_decode_matches_classical(self, plan):
        model = NeuralMinSumDecoder(num_iterations=8, depth_L=0, weight_sharing="scalar")
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((16, plan.C * plan.Z)), 4.0)
        params = _init(model, plan)
        bits = model.decode(params, llr, plan)
        classical = decode_min_sum(llr, plan, 8, 1.0)
        np.testing.assert_array_equal(np.asarray(bits), np.asarray(classical.bits))


class TestParameterisation:
    def test_param_counts(self, plan):
        K, Z, T = plan.K, plan.Z, plan.num_edge_types
        for sharing, expect in [("edge", K * Z), ("cell", K), ("type", T), ("scalar", 1)]:
            model = NeuralMinSumDecoder(weight_sharing=sharing, depth_L=2)
            params = _init(model, plan)
            w = params["params"]["w_ch"]
            assert w.size == expect, sharing
            assert params["params"]["w_res"].shape == (2,)

    def test_learnable_alpha(self, plan):
        model = NeuralMinSumDecoder(learnable_alpha=True)
        params = _init(model, plan)
        assert float(params["params"]["alpha"]) == pytest.approx(0.8)

    def test_loss_modes(self, plan):
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(2), jnp.zeros((8, plan.C * plan.Z)), 0.0)
        gt = jnp.zeros((8, plan.C * plan.Z))
        for mode in ("max", "mean"):
            model = NeuralMinSumDecoder(loss_mode=mode)
            soft, loss = model.apply(_init(model, plan, 8), llr, plan, gt)
            assert loss.shape == (8,)
            assert bool((loss >= 0).all())
        # max loss dominates mean loss
        m1 = NeuralMinSumDecoder(loss_mode="max")
        m2 = NeuralMinSumDecoder(loss_mode="mean")
        p = _init(m1, plan, 8)
        _, lmax = m1.apply(p, llr, plan, gt)
        _, lmean = m2.apply(p, llr, plan, gt)
        assert bool((lmax >= lmean - 1e-6).all())

    def test_gradients_flow_to_all_params(self, plan):
        model = NeuralMinSumDecoder(weight_sharing="edge", depth_L=2, learnable_alpha=True)
        llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(3), jnp.zeros((8, plan.C * plan.Z)), 1.0)
        gt = jnp.zeros((8, plan.C * plan.Z))
        params = _init(model, plan, 8)

        def loss_fn(p):
            _, loss = model.apply(p, llr, plan, gt)
            return loss.mean()

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)


class TestTraining:
    def test_loss_decreases(self, plan):
        model = make_standard_decoder(num_iterations=3, depth_L=2)
        trainer = LDPCDecoderTrainer(model, plan, seed=0)
        trainer.train(num_epochs=15, batch_size=32, learning_rate=0.01,
                      snr_range=[2.0, 4.0], validation_interval=100)
        first = np.mean(trainer.train_losses[:3])
        last = np.mean(trainer.train_losses[-3:])
        assert last < first

    def test_tied_decoder_trains(self, plan):
        model = make_tied_decoder(num_iterations=3, sharing="cell")
        trainer = LDPCDecoderTrainer(model, plan, seed=1)
        trainer.train(num_epochs=6, batch_size=16, learning_rate=0.01,
                      snr_range=[3.0], validation_interval=3)
        assert len(trainer.train_losses) == 6
        assert len(trainer.val_losses) == 2

    def test_evaluate_snr_range_monotone(self, plan):
        model = make_standard_decoder(num_iterations=5)
        trainer = LDPCDecoderTrainer(model, plan, seed=2)
        bers, fers = trainer.evaluate_snr_range([0.0, 6.0], batch_size=32, num_trials=4)
        assert bers[1] <= bers[0]
        assert all(0 <= b <= 1 for b in bers + fers)

    def test_train_steps_loss_decreases(self, plan):
        model = make_standard_decoder(num_iterations=3, depth_L=2)
        trainer = LDPCDecoderTrainer(model, plan, seed=0)
        trainer.train_steps(num_steps=40, batch_size=32, learning_rate=0.01,
                            snr_range=[2.0, 4.0], data_mode="random_bits",
                            scan_steps=10, warmup_steps=2)
        assert trainer.step == 40
        assert len(trainer.train_losses) == 40
        assert np.mean(trainer.train_losses[-10:]) < np.mean(trainer.train_losses[:10])

    def test_train_steps_resume_reproduces_trajectory(self, plan, tmp_path):
        """Kill-and-resume from save_state matches the uninterrupted run
        step for step (params, optimizer moments, data stream)."""
        # constant LR: a cosine schedule's horizon is num_steps, so the
        # interrupted leg (num_steps=10) would see a different schedule —
        # resuming a scheduled run requires passing the same total num_steps
        # and a stop via checkpoint_fn/KeyboardInterrupt instead.
        kw = dict(batch_size=16, learning_rate=0.01, snr_range=[3.0],
                  data_mode="random_bits", scan_steps=5, lr_schedule="constant")
        model = make_standard_decoder(num_iterations=2)

        ref = LDPCDecoderTrainer(model, plan, seed=7)
        ref.train_steps(num_steps=20, **kw)

        t1 = LDPCDecoderTrainer(model, plan, seed=7)
        t1.train_steps(num_steps=10, **kw)
        t1.save_state(tmp_path / "state.msgpack")
        t2 = LDPCDecoderTrainer(model, plan, seed=99)  # different seed: all restored
        t2.load_state(tmp_path / "state.msgpack")
        t2.train_steps(num_steps=20, **kw)

        assert t2.train_losses == pytest.approx(ref.train_losses)
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(jnp.allclose(a, b)), ref.params, t2.params))
        assert same

    def test_save_load_roundtrip(self, plan, tmp_path):
        model = make_standard_decoder(num_iterations=2)
        t1 = LDPCDecoderTrainer(model, plan, seed=3)
        t1.train(num_epochs=2, batch_size=8, learning_rate=0.01, snr_range=[3.0])
        path = tmp_path / "model.msgpack"
        t1.save_model(path)
        t2 = LDPCDecoderTrainer(model, plan, seed=99)
        t2.load_model(path)
        chex_equal = jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: bool(jnp.allclose(a, b)), t1.params, t2.params)
        )
        assert chex_equal
        assert list(t2.train_losses) == pytest.approx(list(t1.train_losses))


class TestExtensions:
    def test_offset_minsum_matches_classical_with_zero_offset(self, plan, rng):
        from ldpc_tpu.ops.qc_msg import check_update_minsum

        v2c = jnp.asarray(rng.normal(size=(plan.K, plan.Z, 4)).astype(np.float32))
        a = check_update_minsum(v2c, plan, alpha=0.75, offset=0.0)
        b = check_update_minsum(v2c, plan, alpha=0.75)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # positive offset shrinks magnitudes, clamped at zero
        c = check_update_minsum(v2c, plan, alpha=1.0, offset=0.3)
        assert float(jnp.abs(c).max()) <= float(jnp.abs(
            check_update_minsum(v2c, plan, alpha=1.0)).max())

    def test_per_iteration_weights_shapes(self, plan):
        model = NeuralMinSumDecoder(num_iterations=4, depth_L=2, weight_sharing="cell",
                                    per_iteration=True, learnable_alpha=True,
                                    learnable_offset=True)
        params = _init(model, plan)["params"]
        assert params["w_ch"].shape == (4, plan.K)
        assert params["w_res"].shape == (4, 2)
        assert params["alpha"].shape == (4,)
        assert params["offset"].shape == (4,)

    def test_per_iteration_equals_shared_at_init(self, plan, rng):
        llr = jnp.asarray(rng.normal(size=(4, plan.C * plan.Z)).astype(np.float32) * 2)
        shared = NeuralMinSumDecoder(num_iterations=3, depth_L=2, weight_sharing="scalar")
        tied_t = NeuralMinSumDecoder(num_iterations=3, depth_L=2, weight_sharing="scalar",
                                     per_iteration=True)
        s1, _ = shared.apply(_init(shared, plan), llr, plan)
        s2, _ = tied_t.apply(_init(tied_t, plan), llr, plan)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)

    def test_per_iteration_trains(self, plan):
        model = NeuralMinSumDecoder(num_iterations=3, depth_L=1, weight_sharing="type",
                                    per_iteration=True, learnable_alpha=True)
        tr = LDPCDecoderTrainer(model, plan, seed=0)
        tr.train(num_epochs=5, batch_size=16, learning_rate=0.01, snr_range=[3.0],
                 validation_interval=100)
        assert all(np.isfinite(tr.train_losses))


def test_trainer_plot_methods(plan, tmp_path):
    model = make_standard_decoder(num_iterations=2)
    tr = LDPCDecoderTrainer(model, plan, seed=0)
    tr.train(num_epochs=3, batch_size=8, learning_rate=0.01, snr_range=[3.0],
             validation_interval=2)
    f1, f2 = tr.plot_training_history()
    assert f1 is not None and f2 is not None
    g1, g2 = tr.plot_snr_performance([0, 2], [0.1, 0.01], [0.5, 0.1],
                                     comparison_ber=[0.2, 0.02])
    assert g1 is not None and g2 is not None
