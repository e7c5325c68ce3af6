"""SPMD tests on the virtual 8-device CPU mesh.

Validates the BASELINE.json properties: sharded sweeps are a deterministic
re-partition of single-device results, and the sharded train step runs with
data + tensor parallel shardings.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.classical import decode_min_sum
from ldpc_tpu.models.message_gnn import create_message_gnn_decoder
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.parallel import make_mesh, make_sharded_train_step, mc_sweep, tp_param_sharding


@pytest.fixture(scope="module")
def plan():
    return qc_msg.make_plan(qc_layout(get_base_graph("toy_4x8"), 4))


def test_eight_devices_visible():
    assert len(jax.devices()) == 8


class TestShardedMC:
    def test_sharded_equals_single_device(self, plan):
        """N-chip MC sweep must reproduce the 1-chip result bit-exactly."""
        decode = lambda llr: decode_min_sum(llr, plan, 10, 0.75).bits
        kw = dict(snr_range=[2.0, 5.0], batch_size=64, num_trials=3, seed=7)
        single = mc_sweep(decode, plan, mesh=None, **kw)
        mesh = make_mesh(data=8, model=1)
        sharded = mc_sweep(decode, plan, mesh=mesh, **kw)
        np.testing.assert_array_equal(single["ber"], sharded["ber"])
        np.testing.assert_array_equal(single["fer"], sharded["fer"])

    def test_mesh_2d(self, plan):
        decode = lambda llr: decode_min_sum(llr, plan, 5, 0.75).bits
        mesh = make_mesh(data=4, model=2)
        out = mc_sweep(decode, plan, [4.0], batch_size=32, num_trials=2, mesh=mesh)
        assert 0.0 <= out["ber"][0] <= 1.0


class TestShardedTraining:
    def test_dp_train_step(self, plan):
        mesh = make_mesh(data=8, model=1)
        model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, plan.C * plan.Z)), plan)
        tx = optax.sgd(0.01, momentum=0.9)
        opt_state = tx.init(params)
        step = make_sharded_train_step(model, plan, tx, mesh, batch_size=32)
        with mesh:
            losses = []
            for i in range(5):
                params, opt_state, loss = step(
                    params, opt_state, jax.random.PRNGKey(i), jnp.float32(4.0)
                )
                losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_tp_param_shardings(self, plan):
        mesh = make_mesh(data=4, model=2)
        model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, plan.C * plan.Z)), plan)
        shardings = tp_param_sharding(params, mesh)
        placed = jax.device_put(params, shardings)
        # kernels actually sharded over the model axis
        from jax.sharding import PartitionSpec as P
        kernel = placed["params"]["gnn_layer_0"]["var_to_check_update"]["Dense_0"]["kernel"]
        assert kernel.sharding.spec == P(None, "model")
        tx = optax.sgd(0.01)
        opt_state = tx.init(placed)
        step = make_sharded_train_step(model, plan, tx, mesh, batch_size=16)
        with mesh:
            p2, _, loss = step(placed, opt_state, jax.random.PRNGKey(1), jnp.float32(3.0))
        assert np.isfinite(float(loss))
        k2 = p2["params"]["gnn_layer_0"]["var_to_check_update"]["Dense_0"]["kernel"]
        assert not k2.sharding.is_fully_replicated

    def test_dp_matches_single_device_loss(self, plan):
        """Same keys, same loss whether sharded or not (partitionable RNG)."""
        model = create_message_gnn_decoder(plan, num_iterations=2, hidden_dim=8)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, plan.C * plan.Z)), plan)
        tx = optax.sgd(0.01)
        opt = tx.init(params)
        mesh = make_mesh(data=8, model=1)
        step_sharded = make_sharded_train_step(model, plan, tx, mesh, batch_size=32)
        step_single = make_sharded_train_step(model, plan, tx, None, batch_size=32)
        with mesh:
            _, _, l1 = step_sharded(params, opt, jax.random.PRNGKey(5), jnp.float32(2.0))
        _, _, l2 = step_single(params, opt, jax.random.PRNGKey(5), jnp.float32(2.0))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


class TestFlagshipScale:
    """Production-scale shardings: the Z=32 NR code (H 1344x1664, E=6304)
    with the flagship h=64 corrected GNN — the sizes where padding/VMEM
    pressure and sharding mistakes actually bite (VERDICT r1 weak #6)."""

    @pytest.fixture(scope="class")
    def z32(self):
        plan = qc_msg.make_plan(qc_layout(get_base_graph("nr_2_0_32"), 32))
        from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder

        model = create_corrected_minsum_gnn_decoder(
            plan, num_iterations=2, hidden_dim=64, input_injection=True
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((2, plan.C * plan.Z)), plan
        )
        return plan, model, params

    def test_sharded_sweep_equals_single_device(self, z32):
        plan, model, params = z32
        decode = lambda llr: (model.apply(params, llr, plan)[0] > 0.5).astype(
            jnp.float32
        )
        kw = dict(snr_range=[0.0], batch_size=16, num_trials=1, seed=3)
        single = mc_sweep(decode, plan, mesh=None, **kw)
        sharded = mc_sweep(decode, plan, mesh=make_mesh(data=8), **kw)
        np.testing.assert_array_equal(single["ber"], sharded["ber"])
        np.testing.assert_array_equal(single["fer"], sharded["fer"])

    def test_tp_train_step(self, z32):
        plan, model, params = z32
        mesh = make_mesh(data=4, model=2)
        placed = jax.device_put(params, tp_param_sharding(params, mesh))
        from jax.sharding import PartitionSpec as P

        kernels = [
            x
            for path, x in jax.tree_util.tree_leaves_with_path(placed)
            if getattr(path[-1], "key", "") == "kernel" and x.ndim == 2
            and x.shape[1] % 2 == 0
        ]
        assert kernels and all(k.sharding.spec == P(None, "model") for k in kernels)
        tx = optax.adam(1e-3)
        step = make_sharded_train_step(model, plan, tx, mesh, batch_size=16)
        with mesh:
            p2, _, loss = step(
                placed, tx.init(placed), jax.random.PRNGKey(1), jnp.float32(0.0)
            )
        assert np.isfinite(float(loss))


class TestShardDecode:
    """Fused Pallas kernels under shard_map: the N-chip serving path."""

    def test_fused_minsum_sharded_equals_single(self, plan):
        from ldpc_tpu.codes import get_base_graph, qc_layout
        from ldpc_tpu.ops.pallas_minsum import make_fused_minsum
        from ldpc_tpu.parallel import make_mesh, shard_decode
        from ldpc_tpu.utils import bpsk_awgn_llr

        qc = qc_layout(get_base_graph("toy_4x8"), 4)
        n = qc.num_base_cols * 4
        fused = make_fused_minsum(qc, max_iterations=5, batch_tile=8, interpret=True)
        llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((64, n)), 2.0)
        bits1, conv1 = fused(llr)
        mesh = make_mesh(data=8)
        sharded = shard_decode(fused, mesh)
        bits8, conv8 = sharded(llr)
        np.testing.assert_array_equal(np.asarray(bits8), np.asarray(bits1))
        np.testing.assert_array_equal(np.asarray(conv8), np.asarray(conv1))

    def test_fused_gnn_sharded_equals_single(self, plan):
        from ldpc_tpu.codes import get_base_graph, qc_layout
        from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder
        from ldpc_tpu.parallel import make_mesh, shard_decode
        from ldpc_tpu.utils import bpsk_awgn_llr

        qc = qc_layout(get_base_graph("toy_4x8"), 4)
        plan4 = qc_msg.make_plan(qc)
        n = plan4.C * plan4.Z
        model = create_message_gnn_decoder(plan4, num_iterations=2, hidden_dim=8)
        llr = bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((8 * 32, n)), 3.0)
        params = model.init(jax.random.PRNGKey(2), llr, plan4)
        fused = make_fused_gnn_decoder(qc, params, num_iterations=2, hidden_dim=8,
                                       interpret=True)
        soft1 = fused(llr)
        sharded = shard_decode(fused, make_mesh(data=8))
        np.testing.assert_array_equal(np.asarray(sharded(llr)), np.asarray(soft1))
