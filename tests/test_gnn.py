"""Node-centered GNN decoder tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.gnn import make_base_graph_gnn_decoder, make_gnn_decoder
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.training import LDPCDecoderTrainer
from ldpc_tpu.utils import channel as ch


@pytest.fixture(scope="module")
def plan():
    return qc_msg.make_plan(qc_layout(get_base_graph("toy_4x8"), 4))


def test_param_sharing_structures(plan):
    llr = jnp.zeros((2, plan.C * plan.Z))
    shift = make_gnn_decoder()
    cell = make_base_graph_gnn_decoder()
    p_shift = shift.init(jax.random.PRNGKey(0), llr, plan)
    p_cell = cell.init(jax.random.PRNGKey(0), llr, plan)
    assert p_shift["params"]["w_ch"].shape == (plan.num_edge_types,)
    assert p_cell["params"]["w_ch"].shape == (plan.K,)
    assert p_shift["params"]["w_c2v"].shape == (plan.num_edge_types,)


def test_decodes_at_init(plan):
    """Unit-init weights = plain min-sum: must decode clean channels."""
    model = make_gnn_decoder(num_iterations=8, depth_L=0)
    n = plan.C * plan.Z
    llr = ch.bpsk_awgn_llr(jax.random.PRNGKey(1), jnp.zeros((32, n)), 8.0)
    params = model.init(jax.random.PRNGKey(0), llr, plan)
    bits = model.decode(params, llr, plan)
    assert float(bits.sum()) == 0.0


def test_trains(plan):
    model = make_gnn_decoder(num_iterations=3, depth_L=2)
    tr = LDPCDecoderTrainer(model, plan, seed=0)
    tr.train(num_epochs=10, batch_size=16, learning_rate=0.01, snr_range=[2.0, 4.0],
             validation_interval=100)
    assert np.mean(tr.train_losses[-3:]) < np.mean(tr.train_losses[:3])
    assert all(np.isfinite(tr.train_losses))
