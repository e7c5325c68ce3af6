"""Neural min-sum LDPC decoders with learnable weights.

First-class implementations of the reference's *specified but missing*
models (SURVEY.md §0/§2 rows 16-17):

* ``LDPCNeuralDecoder(num_nodes, num_iterations, depth_L)`` — iterative
  check-layer -> residual variable-layer stack with per-edge channel weights
  ``w_ch`` in R^E and residual weights ``w_res`` in R^L (reconstructed from
  its call sites `main.py:62-82`, `training/trainer.py:102,180,245` and the
  notebook prototype ``LDPCDecoderResidual``, EE4002R_2025.ipynb cell 11,
  whose layer math lives in ``models/layers.py``: CheckLayer :5-66,
  VariableLayer :69-125, ResidualLayer :128-168, OutputLayer :171-210).
* ``TiedNeuralLDPCDecoder(base_graph, Z, ...)`` — identical math with
  weights tied per base-graph cell, shared across the Z lifted copies
  (`main.py:73-80`; notebook cell 15's per-cell ``CellTransform`` sharing).

Here both are one flax module, :class:`NeuralMinSumDecoder`, differing only
in the ``weight_sharing`` axis ("edge" -> standard, "cell"/"type" -> tied);
the decode loop is the same `lax.scan` QC message passing as the classical
decoders, so a trained model runs at classical-decoder speed.
"""
from __future__ import annotations

from typing import Literal

import flax.linen as nn
import jax
import jax.numpy as jnp

from ldpc_tpu.ops import qc_msg
from ldpc_tpu.ops.qc_msg import QCPlan

Array = jax.Array

WeightSharing = Literal["edge", "cell", "type", "scalar"]


class NeuralMinSumDecoder(nn.Module):
    """Learnable min-sum decoder over the QC edge layout.

    Args (hyperparameters):
        num_iterations: decoding iterations (reference default 5).
        depth_L: residual FIFO depth (reference default 2).
        weight_sharing: granularity of the channel weights ``w_ch``:
            "edge"   — one weight per lifted edge (K, Z): the standard
                       ``LDPCNeuralDecoder`` (w_ch in R^E, layers.py:140);
            "cell"   — one per base-graph cell (K,), shared across Z: the
                       ``TiedNeuralLDPCDecoder`` sharing (main.py:73-80);
            "type"   — one per shift value (num_edge_types,): the message-GNN
                       style sharing (message_gnn_decoder.py:490-536);
            "scalar" — a single weight (notebook cell 11 uses per-node
                       weights of width E; scalar is the min config).
        learnable_alpha: if True, the min-sum scaling factor is a trained
            parameter (init 0.8, as `message_gnn_decoder.py:974`); else 1.0
            (plain min-sum check update, notebook cell 21 semantics).
        output_mode: "sum_plus_input" — soft = sigmoid(sum of final check
            messages per variable + channel LLR) (OutputLayer semantics,
            layers.py:194-198 combined with per-variable aggregation);
            "mean_edges" — mean of final check messages per variable only
            (notebook cell 11 ``output_mapping`` semantics).
        loss_mode: "max" — per-frame max-over-bits BCE, the FER surrogate of
            layers.py:203-208; "mean" — per-frame mean BCE
            (message_gnn_decoder.py:313-315).
    """

    num_iterations: int = 5
    depth_L: int = 2
    weight_sharing: WeightSharing = "edge"
    learnable_alpha: bool = False
    learnable_offset: bool = False  # offset min-sum beta (arXiv:1701.05931)
    per_iteration: bool = False  # untied weights per iteration (Nachmani et al.)
    output_mode: Literal["sum_plus_input", "mean_edges"] = "sum_plus_input"
    loss_mode: Literal["max", "mean"] = "max"

    def _iters_dim(self) -> tuple[int, ...]:
        return (self.num_iterations,) if self.per_iteration else ()

    def _w_ch(self, plan: QCPlan) -> Array:
        """Channel weight broadcast to ([T,] K, Z, 1); T when per-iteration."""
        lead = self._iters_dim()
        if self.weight_sharing == "edge":
            w = self.param("w_ch", nn.initializers.ones, lead + (plan.K, plan.Z))
        elif self.weight_sharing == "cell":
            w = self.param("w_ch", nn.initializers.ones, lead + (plan.K,))[..., :, None]
            w = jnp.broadcast_to(w, lead + (plan.K, plan.Z))
        elif self.weight_sharing == "type":
            wt = self.param("w_ch", nn.initializers.ones, lead + (plan.num_edge_types,))
            w = wt[..., plan.edge_type][..., :, None]
            w = jnp.broadcast_to(w, lead + (plan.K, plan.Z))
        elif self.weight_sharing == "scalar":
            w = jnp.broadcast_to(
                self.param("w_ch", nn.initializers.ones, lead)[..., None, None]
                if lead
                else self.param("w_ch", nn.initializers.ones, ()),
                lead + (plan.K, plan.Z),
            )
        else:
            raise ValueError(f"unknown weight_sharing {self.weight_sharing!r}")
        return w[..., :, :, None]

    @nn.compact
    def __call__(self, llr: Array, plan: QCPlan, ground_truth: Array | None = None):
        """Decode (B, n) channel LLRs.

        Returns ``(soft_bits, loss)``: soft bit-1 probabilities (B, n) and a
        per-frame loss vector (B,) (None without ground truth) — the
        reference decoder call signature
        ``decoder(llrs, check_idx, var_idx, gt) -> (soft, loss)``.
        """
        B = llr.shape[0]
        llr_cz = qc_msg.llr_to_cz(llr, plan)  # (C, Z, B)
        edge_llr = llr_cz[plan.edge_col]  # (K, Z, B) per-edge channel copies

        lead = self._iters_dim()
        w_ch = self._w_ch(plan)
        # Residual taps start at 0 (the reference initializes them to 1,
        # layers.py:141, which *degrades* the decoder below classical
        # min-sum until trained; zero init starts exactly at classical
        # performance and training can only improve from there).
        w_res = self.param("w_res", nn.initializers.zeros, lead + (self.depth_L,))
        alpha = (
            self.param("alpha", nn.initializers.constant(0.8), lead)
            if self.learnable_alpha
            else (jnp.ones(lead) if lead else 1.0)
        )
        offset = (
            self.param("offset", nn.initializers.zeros, lead)
            if self.learnable_offset
            else (jnp.zeros(lead) if lead else 0.0)
        )

        def step(carry, xs):
            w_ch_t, w_res_t, alpha_t, offset_t = xs
            q_prev, fifo = carry  # q: (K,Z,B); fifo: (L,K,Z,B) newest first
            c2v = qc_msg.check_update_minsum(q_prev, plan, alpha=alpha_t, offset=offset_t)
            # Leave-one-out sum of check messages per edge + weighted channel
            # LLR + residual taps (notebook cell 11 variable_layer_update).
            colsum = qc_msg.col_sum(c2v, plan)
            loo = colsum[plan.edge_col] - c2v
            res = jnp.tensordot(w_res_t, fifo, axes=1) if self.depth_L else 0.0
            q = loo + w_ch_t * edge_llr + res
            fifo = jnp.concatenate([q[None], fifo[:-1]], axis=0) if self.depth_L else fifo
            return (q, fifo), c2v

        T = self.num_iterations
        if self.per_iteration:
            xs = (w_ch, w_res, alpha, offset)
        else:
            tile = lambda x: jnp.broadcast_to(jnp.asarray(x)[None], (T,) + jnp.shape(x))
            xs = (tile(w_ch), tile(w_res), tile(jnp.asarray(alpha)), tile(jnp.asarray(offset)))
        fifo0 = jnp.zeros((self.depth_L, plan.K, plan.Z, B), llr.dtype)
        (_, _), c2v_all = jax.lax.scan(step, (edge_llr, fifo0), xs, length=T)
        c2v_final = c2v_all[-1]

        if self.output_mode == "sum_plus_input":
            combined = llr_cz + qc_msg.col_sum(c2v_final, plan)
        else:  # mean_edges
            counts = plan.col_incidence.sum(axis=1)[:, None, None]
            combined = qc_msg.col_sum(c2v_final, plan) / jnp.maximum(counts, 1.0)
        # LLR > 0 -> bit 0, so the bit-1 logit is -LLR.
        logits = -qc_msg.cz_to_llr(combined)
        soft_bits = jax.nn.sigmoid(logits)

        loss = None
        if ground_truth is not None:
            # Stable BCE straight from logits: softplus((1-2b) * logit).
            # Computing -log(sigmoid(.)) through probabilities overflows the
            # fused backward pass once |LLR| > ~88 (exp range of float32),
            # which post-iteration LLRs routinely exceed.
            bce = jax.nn.softplus((1.0 - 2.0 * ground_truth) * logits)
            loss = bce.max(axis=-1) if self.loss_mode == "max" else bce.mean(axis=-1)
        return soft_bits, loss

    def decode(self, params, llr: Array, plan: QCPlan) -> Array:
        """Hard-decision decode (B, n) -> bits, reference ``decode`` API."""
        soft, _ = self.apply(params, llr, plan)
        return (soft > 0.5).astype(jnp.float32)


def make_standard_decoder(num_iterations=5, depth_L=2, **kw) -> NeuralMinSumDecoder:
    """The reference ``LDPCNeuralDecoder`` configuration (per-edge weights)."""
    return NeuralMinSumDecoder(
        num_iterations=num_iterations, depth_L=depth_L, weight_sharing="edge", **kw
    )


def make_tied_decoder(num_iterations=5, depth_L=2, sharing: WeightSharing = "cell", **kw):
    """The reference ``TiedNeuralLDPCDecoder`` configuration (weights shared
    across the Z lifted copies of each base-graph cell)."""
    return NeuralMinSumDecoder(
        num_iterations=num_iterations, depth_L=depth_L, weight_sharing=sharing, **kw
    )
