"""Differential parity vs the ACTUAL PyTorch reference implementation.

Imports the reference package from /root/reference (read-only) and feeds
identical LLRs to both stacks:

* `models/traditional_decoders.py:4-285` BeliefPropagationDecoder /
  MinSumScaledDecoder vs our `decode_bp` / `decode_min_sum` — identical hard
  decisions on NR_2_0_4 (and a quick NR_2_0_32 case);
* `models/layers.py:5-125` CheckLayer / VariableLayer vs `qc_msg`
  check/variable updates — edge-for-edge numeric parity through
  `QCLayout.flat_edge_id_var_aligned`.

This converts the repo's golden-model parity chain (tests/golden.py is our
own numpy spec) into a direct differential against the reference code, per
BASELINE.md's reproduction requirement.  Torch runs on CPU; the reference's
per-edge Python loops make large cases slow, so sizes here are small —
the full regenerated reference curves live in tools/reference_curves.py
and results/reference_*.json.
"""
import sys

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from ldpc_neural_decoder.models.traditional_decoders import (  # noqa: E402
    BeliefPropagationDecoder,
    MinSumScaledDecoder,
)
from ldpc_neural_decoder.models.layers import CheckLayer, VariableLayer  # noqa: E402
from ldpc_neural_decoder.utils.ldpc_utils import create_LLR_mapping  # noqa: E402

from ldpc_tpu.codes import expand_base_matrix, get_base_graph, qc_layout  # noqa: E402
from ldpc_tpu.models.classical import decode_bp, decode_min_sum  # noqa: E402
from ldpc_tpu.ops import qc_msg  # noqa: E402


def _setup(code: str, Z: int):
    bg = get_base_graph(code)
    qc = qc_layout(bg, Z)
    H = expand_base_matrix(bg, Z)
    return qc, H, qc_msg.make_plan(qc)


def _llrs(H, batch, seed, scale=2.0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(batch, H.shape[1])) * scale).astype(np.float32)


class TestDecisionParity:
    """Identical LLRs -> identical hard decisions, fixed iteration count."""

    @pytest.mark.parametrize("iters", [1, 5])
    def test_minsum_nr_2_0_4(self, iters):
        qc, H, plan = _setup("nr_2_0_4", 4)
        llr = _llrs(H, 4, seed=iters)
        ref = MinSumScaledDecoder(torch.tensor(np.asarray(H), dtype=torch.float32),
                                  max_iterations=iters, scaling_factor=0.75,
                                  early_stopping=False)
        ref_bits, _ = ref.decode(torch.tensor(llr))
        ours = decode_min_sum(jnp.asarray(llr), plan, iters, 0.75)
        np.testing.assert_array_equal(np.asarray(ours.bits), ref_bits.numpy())

    @pytest.mark.parametrize("iters", [1, 5])
    def test_bp_nr_2_0_4(self, iters):
        qc, H, plan = _setup("nr_2_0_4", 4)
        llr = _llrs(H, 4, seed=10 + iters)
        ref = BeliefPropagationDecoder(torch.tensor(np.asarray(H), dtype=torch.float32),
                                       max_iterations=iters, early_stopping=False)
        ref_bits, _ = ref.decode(torch.tensor(llr))
        ours = decode_bp(jnp.asarray(llr), plan, iters)
        np.testing.assert_array_equal(np.asarray(ours.bits), ref_bits.numpy())

    def test_minsum_nr_2_0_32(self):
        qc, H, plan = _setup("nr_2_0_32", 32)
        llr = _llrs(H, 2, seed=3)
        ref = MinSumScaledDecoder(torch.tensor(np.asarray(H), dtype=torch.float32),
                                  max_iterations=2, scaling_factor=0.75,
                                  early_stopping=False)
        ref_bits, _ = ref.decode(torch.tensor(llr))
        ours = decode_min_sum(jnp.asarray(llr), plan, 2, 0.75)
        np.testing.assert_array_equal(np.asarray(ours.bits), ref_bits.numpy())


class TestLayerParity:
    """Reference CheckLayer/VariableLayer vs qc_msg updates, edge-for-edge.

    Message tensors are converted between our var-aligned (K, Z, B) blocks
    and the reference's flat (B, E) LLR-index order via
    `flat_edge_id_var_aligned` (the (var, check)-sorted enumeration of
    `ldpc_utils.py:77-87`).
    """

    @pytest.fixture(scope="class")
    def setup(self):
        qc, H, plan = _setup("toy_4x8", 4)
        flat_id = qc.flat_edge_id_var_aligned()  # (K, Z)
        mapping = create_LLR_mapping(torch.tensor(np.asarray(H).T, dtype=torch.float32))
        _, check_idx, var_idx, _ = mapping
        return qc, H, plan, flat_id, check_idx, var_idx

    def _to_var_aligned(self, flat, flat_id):
        """(B, E) reference order -> (K, Z, B)."""
        return jnp.asarray(flat[:, flat_id].transpose(1, 2, 0))

    def _to_flat(self, var_aligned, flat_id):
        """(K, Z, B) -> (B, E) reference order."""
        K, Z, B = var_aligned.shape
        out = np.empty((B, K * Z), dtype=np.float32)
        out[:, flat_id.reshape(-1)] = np.asarray(var_aligned).reshape(K * Z, B).T
        return out

    def test_check_layer(self, setup):
        qc, H, plan, flat_id, check_idx, _ = setup
        rng = np.random.default_rng(0)
        E = qc.num_edges
        v2c = rng.normal(size=(3, E)).astype(np.float32) * 2
        ref_out = CheckLayer()(torch.tensor(v2c), check_idx).numpy()
        ours = qc_msg.check_update_minsum(self._to_var_aligned(v2c, flat_id), plan, alpha=1.0)
        np.testing.assert_allclose(self._to_flat(ours, flat_id), ref_out, rtol=1e-6, atol=1e-6)

    def test_variable_layer(self, setup):
        qc, H, plan, flat_id, _, var_idx = setup
        rng = np.random.default_rng(1)
        E, n = qc.num_edges, H.shape[1]
        c2v = rng.normal(size=(3, E)).astype(np.float32)
        llr = rng.normal(size=(3, n)).astype(np.float32)
        # per-edge LLR in reference order is llr[var(e)]
        var_of_flat = np.empty(E, dtype=np.int64)
        v = (np.asarray(qc.edge_col)[:, None] * qc.Z + np.arange(qc.Z)[None, :])
        var_of_flat[flat_id.reshape(-1)] = v.reshape(-1)
        llr_edges = llr[:, var_of_flat]
        ref_out = VariableLayer()(torch.tensor(llr_edges), torch.tensor(c2v), var_idx).numpy()
        llr_cz = qc_msg.llr_to_cz(jnp.asarray(llr), plan)
        v2c, _ = qc_msg.var_update(self._to_var_aligned(c2v, flat_id), llr_cz, plan)
        np.testing.assert_allclose(self._to_flat(v2c, flat_id), ref_out, rtol=1e-5, atol=1e-5)
