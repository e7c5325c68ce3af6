"""Fused neural min-sum inference kernel vs the flax model (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models.neural_min_sum import NeuralMinSumDecoder
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.ops.pallas_neural import make_fused_neural_minsum
from ldpc_tpu.utils import bpsk_awgn_llr


@pytest.mark.parametrize("sharing,depth,learn_a,learn_o,per_it", [
    ("scalar", 0, False, False, False),
    ("cell", 2, True, False, False),
    ("edge", 2, True, True, False),
    ("type", 1, True, False, True),
])
def test_matches_flax_model(sharing, depth, learn_a, learn_o, per_it):
    qc = qc_layout(get_base_graph("toy_4x8"), 4)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = NeuralMinSumDecoder(num_iterations=3, depth_L=depth, weight_sharing=sharing,
                                learnable_alpha=learn_a, learnable_offset=learn_o,
                                per_iteration=per_it)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(0), jnp.zeros((8, n)), 2.0)
    key = jax.random.PRNGKey(1)
    params = model.init(key, llr, plan)
    # randomize weights so the test is not trivially all-ones/zeros
    params = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(key, x.shape), params
    )
    expect = model.decode(params, llr, plan)
    fused = make_fused_neural_minsum(qc, params, num_iterations=3, depth_L=depth,
                                     batch_tile=8, interpret=True, per_iteration=per_it)
    got = fused(llr)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_matches_flax_model_z32():
    """Z=32 — the production code's lifting, the committed Z=32 OMS results
    path (per-iteration offset min-sum, edge sharing)."""
    qc = qc_layout(get_base_graph("toy_4x8"), 32)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    model = NeuralMinSumDecoder(num_iterations=3, depth_L=2, weight_sharing="edge",
                                learnable_alpha=True, learnable_offset=True,
                                per_iteration=True)
    llr = bpsk_awgn_llr(jax.random.PRNGKey(4), jnp.zeros((8, n)), 2.0)
    key = jax.random.PRNGKey(5)
    params = model.init(key, llr, plan)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.1 * jax.random.normal(key, x.shape), params
    )
    expect = model.decode(params, llr, plan)
    fused = make_fused_neural_minsum(qc, params, num_iterations=3, depth_L=2,
                                     batch_tile=8, interpret=True, per_iteration=True)
    got = fused(llr)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
