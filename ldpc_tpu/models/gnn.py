"""Node-centered GNN LDPC decoder (Tanner graph as the GNN).

The reference ships this model's *specification* but not its code: the module
``models/gnn_ldpc_decoder.py`` is absent from the snapshot while its API is
pinned by call sites (`run_comparison_all.py:105-121` —
``GNNLDPCDecoder(H, num_iterations, depth_L, num_edge_types)``) and its
component list by `ldpc_neural_decoder/README.md:143-152`: GNNCheckLayer /
GNNVariableLayer / GNNResidualLayer / GNNOutputLayer with *shared weights*,
plus ``BaseGraphGNNDecoder`` extending the sharing to the 5G base-graph
structure.

Design: belief-propagation iterations on the Tanner graph where the trainable
degrees of freedom are indexed by **edge type** and shared across all edges
of that type (the node-centered analogue of the message-GNN's type sharing):

* ``w_ch[type]``  — channel-LLR weights (GNNVariableLayer sharing)
* ``w_c2v[type]`` — check-message scaling (GNNCheckLayer sharing)
* ``w_res[L]``    — residual connection weights (GNNResidualLayer)

``type_source`` selects the sharing structure: "shift" shares by circulant
shift value (``num_edge_types`` classes), "cell" by base-graph cell — the
``BaseGraphGNNDecoder`` extension, where every Z-lifted copy of a base edge
shares parameters.
"""
from __future__ import annotations

from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldpc_tpu.ops import qc_msg
from ldpc_tpu.ops.qc_msg import QCPlan

Array = jax.Array


class GNNLDPCDecoder(nn.Module):
    """Tanner-graph GNN decoder with typed weight sharing."""

    num_iterations: int = 5
    depth_L: int = 2
    type_source: Literal["shift", "cell"] = "shift"
    loss_mode: Literal["max", "mean"] = "max"

    def _types(self, plan: QCPlan):
        if self.type_source == "shift":
            return plan.edge_type, plan.num_edge_types
        return jnp.arange(plan.K), plan.K

    @nn.compact
    def __call__(self, llr: Array, plan: QCPlan, ground_truth: Array | None = None):
        B = llr.shape[0]
        llr_cz = qc_msg.llr_to_cz(llr, plan)
        edge_llr = llr_cz[plan.edge_col]

        types, num_types = self._types(plan)
        w_ch = self.param("w_ch", nn.initializers.ones, (num_types,))[types][:, None, None]
        w_c2v = self.param("w_c2v", nn.initializers.ones, (num_types,))[types][:, None, None]
        # Residual taps start at 0 (the reference initializes them to 1,
        # layers.py:141, which *degrades* the decoder below classical
        # min-sum until trained; zero init starts exactly at classical
        # performance and training can only improve from there).
        w_res = self.param("w_res", nn.initializers.zeros, (self.depth_L,))

        def step(carry, _):
            q_prev, fifo = carry
            c2v = w_c2v * qc_msg.check_update_minsum(q_prev, plan, alpha=1.0)
            colsum = qc_msg.col_sum(c2v, plan)
            loo = colsum[plan.edge_col] - c2v
            res = jnp.tensordot(w_res, fifo, axes=1) if self.depth_L else 0.0
            q = loo + w_ch * edge_llr + res
            fifo = jnp.concatenate([q[None], fifo[:-1]], axis=0) if self.depth_L else fifo
            return (q, fifo), c2v

        fifo0 = jnp.zeros((self.depth_L, plan.K, plan.Z, B), llr.dtype)
        (_, _), c2v_all = jax.lax.scan(step, (edge_llr, fifo0), None, length=self.num_iterations)

        combined = llr_cz + qc_msg.col_sum(c2v_all[-1], plan)
        logits = -qc_msg.cz_to_llr(combined)
        soft_bits = jax.nn.sigmoid(logits)

        loss = None
        if ground_truth is not None:
            bce = jax.nn.softplus((1.0 - 2.0 * ground_truth) * logits)
            loss = bce.max(axis=-1) if self.loss_mode == "max" else bce.mean(axis=-1)
        return soft_bits, loss

    def decode(self, params, llr: Array, plan: QCPlan) -> Array:
        soft, _ = self.apply(params, llr, plan)
        return (soft > 0.5).astype(jnp.float32)


def make_gnn_decoder(num_iterations=5, depth_L=2, **kw) -> GNNLDPCDecoder:
    """``GNNLDPCDecoder`` configuration (shift-type sharing)."""
    return GNNLDPCDecoder(num_iterations=num_iterations, depth_L=depth_L, type_source="shift", **kw)


def make_base_graph_gnn_decoder(num_iterations=5, depth_L=2, **kw) -> GNNLDPCDecoder:
    """``BaseGraphGNNDecoder`` configuration (per-base-cell sharing)."""
    return GNNLDPCDecoder(num_iterations=num_iterations, depth_L=depth_L, type_source="cell", **kw)
