"""Comparative evaluation of classical and neural decoders.

Capability parity with the reference ``training/comparative_evaluation.py``
(`ComparativeEvaluator`:10-387): run any mix of decoders over an SNR grid of
all-zero-codeword Monte-Carlo trials, tracking BER, FER and average
iterations; save/load results; print a text summary.  Differences by design:

* every decoder is evaluated through one jitted counts function (the
  reference re-enters Python per trial per decoder);
* sweeps can shard over a device mesh (pass ``mesh=``) — the multi-chip
  path the reference lacks;
* results are JSON (the reference pickles ``.pt`` dicts,
  `comparative_evaluation.py:335-345`).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_tpu.models.classical import decode_bp, decode_min_sum
from ldpc_tpu.ops.qc_msg import QCPlan
from ldpc_tpu.parallel.sharding import mc_sweep
from ldpc_tpu.utils import channel as ch
from ldpc_tpu.utils.logging import get_logger
from ldpc_tpu.utils.metrics import REGISTRY, MetricsRegistry, decode_throughput

_LOG = get_logger("ldpc_tpu.evaluator")


class ComparativeEvaluator:
    """Evaluate registered decoders over an SNR range.

    Decoders are registered as ``name -> decode_bits`` callables mapping
    (B, n) LLRs to hard bits, plus an optional iterations extractor.
    Convenience constructors cover the reference's five decoder types.
    """

    def __init__(
        self,
        plan: QCPlan,
        snr_range=None,
        batch_size: int = 32,
        num_trials: int = 100,
        mesh=None,
        modulation: str = "qpsk",
        convention: str = "consistent",
        seed: int = 4321,
        encoder=None,
    ):
        self.plan = plan
        self.snr_range = [float(s) for s in (snr_range if snr_range is not None else range(-2, 7))]
        self.batch_size = batch_size
        self.num_trials = num_trials
        self.mesh = mesh
        self.modulation = modulation
        self.convention = convention
        self.seed = seed
        self.encoder = encoder
        self._decoders: dict[str, dict[str, Any]] = {}
        self.results: dict[str, Any] = {}

    # -- registration -------------------------------------------------------

    def add_decoder(self, name: str, decode_bits: Callable, avg_iters_fn: Callable | None = None,
                    param_count: int = 0) -> None:
        self._decoders[name] = {
            "decode": decode_bits,
            "iters": avg_iters_fn,
            "params": param_count,
        }

    def add_belief_propagation(self, max_iterations: int = 50, name: str = "Belief Propagation",
                               qc=None, fused: bool = False, early_exit: bool = True):
        """``fused=True`` (requires ``qc=`` the QCLayout) evaluates through
        the VMEM-resident Pallas kernel instead of the XLA scan.

        On the XLA path ``early_exit=True`` (default) decodes with the
        batch-global while-loop — identical decisions/statistics, but
        high-SNR sweep points stop iterating once the whole batch is valid.
        Sharded sweeps (``mesh``) keep the fixed-trip scan: under pjit an
        early exit would sync all chips to the slowest shard anyway.
        """
        plan = self.plan
        if fused:
            from ldpc_tpu.models.classical import _make_fused, _resolve_backend

            kernel = _make_fused(_resolve_backend("auto", qc), qc, max_iterations,
                                 mode="sumproduct", alpha=1.0, early_exit=early_exit)
            if kernel is not None:  # else: fall through to the XLA path
                self.add_decoder(name, lambda llr: kernel(llr)[0], lambda llr: kernel(llr)[1])
                return
        ee = early_exit and self.mesh is None

        def decode(llr):
            return decode_bp(llr, plan, max_iterations, early_exit=ee).bits

        def iters(llr):
            return decode_bp(llr, plan, max_iterations, early_exit=ee).conv_iter

        self.add_decoder(name, decode, iters)

    def add_min_sum(self, max_iterations: int = 50, scaling_factor: float = 0.75,
                    name: str = "Min-Sum Scaled", qc=None, fused: bool = False,
                    early_exit: bool = True):
        plan = self.plan
        if fused:
            from ldpc_tpu.models.classical import _make_fused, _resolve_backend

            kernel = _make_fused(_resolve_backend("auto", qc), qc, max_iterations,
                                 alpha=scaling_factor, early_exit=early_exit)
            if kernel is not None:  # else: fall through to the XLA path
                self.add_decoder(name, lambda llr: kernel(llr)[0], lambda llr: kernel(llr)[1])
                return
        ee = early_exit and self.mesh is None

        def decode(llr):
            return decode_min_sum(llr, plan, max_iterations, scaling_factor, early_exit=ee).bits

        def iters(llr):
            return decode_min_sum(llr, plan, max_iterations, scaling_factor, early_exit=ee).conv_iter

        self.add_decoder(name, decode, iters)

    def add_model(self, name: str, model, params) -> None:
        """Register a flax decoder model (neural min-sum / GNN / message GNN)."""
        plan = self.plan

        def decode(llr):
            soft, _ = model.apply(params, llr, plan)
            return (soft > 0.5).astype(jnp.float32)

        n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
        self.add_decoder(name, decode, None, param_count=n_params)

    # -- evaluation ---------------------------------------------------------

    def evaluate_all(self, log: Callable[[str], None] | None = _LOG.info,
                     metrics: MetricsRegistry = REGISTRY) -> dict[str, Any]:
        """MC-sweep every registered decoder.  Returns and stores results.

        Per-decoder wall time and decoded-bits/s are recorded into
        ``metrics`` (the process registry by default).
        """
        out: dict[str, Any] = {"snr_range": self.snr_range, "decoders": {}}
        n = self.plan.C * self.plan.Z
        for name, spec in self._decoders.items():
            if log:
                log(f"evaluating {name} ...")
            t0 = time.time()
            sweep = mc_sweep(
                spec["decode"],
                self.plan,
                self.snr_range,
                self.batch_size,
                self.num_trials,
                mesh=self.mesh,
                seed=self.seed,
                modulation=self.modulation,
                convention=self.convention,
                encoder=self.encoder,
            )
            frames = self.batch_size * self.num_trials * len(self.snr_range)
            metrics.record(f"eval_{name}_s", time.time() - t0)
            decode_throughput(frames, n, time.time() - t0, metrics, name=f"eval_{name}")
            entry: dict[str, Any] = {
                "ber": sweep["ber"],
                "fer": sweep["fer"],
                "param_count": spec["params"],
            }
            if spec["iters"] is not None:
                entry["avg_iterations"] = self._avg_iterations(spec["iters"])
            out["decoders"][name] = entry
        self.results = out
        return out

    def _avg_iterations(self, iters_fn) -> list[float]:
        """Mean convergence iteration per SNR point (classical decoders)."""
        n = self.plan.C * self.plan.Z
        avg = []
        base = jax.random.PRNGKey(self.seed)
        for i, snr in enumerate(self.snr_range):
            tot = cnt = 0.0
            for t in range(self.num_trials):
                key = jax.random.fold_in(jax.random.fold_in(base, i), t)
                bits = jnp.zeros((self.batch_size, n))
                if self.modulation == "qpsk":
                    llr = ch.qpsk_awgn_llr(key, bits, snr, self.convention)
                else:
                    llr = ch.bpsk_awgn_llr(key, bits, snr)
                it = iters_fn(llr)
                tot += float(it.sum())
                cnt += it.shape[0]
            avg.append(tot / cnt)
        return avg

    # -- persistence & reporting -------------------------------------------

    def save_results(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps(self.results, indent=2))

    def load_results(self, path: str | Path) -> dict[str, Any]:
        self.results = json.loads(Path(path).read_text())
        return self.results

    def print_summary(self, log: Callable[[str], None] = print) -> None:
        """Text summary (reference `print_summary` :347-387)."""
        res = self.results
        if not res:
            log("no results — run evaluate_all() first")
            return
        log(f"{'SNR (dB)':>8} | " + " | ".join(f"{n[:20]:>20}" for n in res["decoders"]))
        for i, snr in enumerate(res["snr_range"]):
            row = [f"{snr:8.1f}"]
            for name, entry in res["decoders"].items():
                row.append(f"BER {entry['ber'][i]:.2e} FER {entry['fer'][i]:.3f}"[:20].rjust(20))
            log(" | ".join(row))
        for name, entry in res["decoders"].items():
            if entry.get("param_count"):
                log(f"{name}: {entry['param_count']} trainable parameters")
