"""Training and Monte-Carlo evaluation for neural LDPC decoders.

Capability parity with the reference ``training/trainer.py``
(`LDPCDecoderTrainer`:21-364): SGD(momentum, weight-decay) over SNR-mixed
random-bit batches through a QPSK/AWGN channel, periodic validation,
all-zero-codeword BER/FER evaluation over an SNR range, history tracking and
checkpointing — redesigned as a thin stateful wrapper around jitted pure
functions (one compiled train step reused across all epochs and SNRs; the
reference re-traces per-batch Python channel loops every step).
"""
from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ldpc_tpu.ops.qc_msg import QCPlan
from ldpc_tpu.utils import channel as ch
from ldpc_tpu.utils.logging import get_logger
from ldpc_tpu.utils.metrics import REGISTRY, MetricsRegistry

Array = jax.Array

_LOG = get_logger("ldpc_tpu.trainer")


class LDPCDecoderTrainer:
    """Trainer for any decoder model with the ``(llr, plan, gt) -> (soft, loss)``
    call signature (NeuralMinSumDecoder, MessageGNNDecoder, ...)."""

    def __init__(
        self,
        model,
        plan: QCPlan,
        seed: int = 0,
        convention: str = "consistent",
        modulation: str = "qpsk",
        encoder=None,
    ):
        self.model = model
        self.plan = plan
        self.convention = convention
        self.modulation = modulation
        self.encoder = encoder
        self.n = plan.C * plan.Z
        key = jax.random.PRNGKey(seed)
        self.init_key, self.data_key = jax.random.split(key)
        dummy = jnp.zeros((2, self.n))
        self.params = model.init(self.init_key, dummy, plan)
        self.opt_state = None  # train_steps state (resumable)
        self.step = 0
        # Training history (payload parity with reference trainer.py:39-43)
        self.train_losses: list[float] = []
        self.val_losses: list[float] = []
        self.ber_history: list[float] = []
        self.fer_history: list[float] = []

    # -- channel helper ----------------------------------------------------

    def _channel(self, key: Array, bits: Array, snr_db) -> Array:
        if self.modulation == "qpsk":
            return ch.qpsk_awgn_llr(key, bits, snr_db, self.convention)
        return ch.bpsk_awgn_llr(key, bits, snr_db)

    # -- training ----------------------------------------------------------

    def train(
        self,
        num_epochs: int,
        batch_size: int,
        learning_rate: float,
        snr_range=None,
        momentum: float = 0.9,
        weight_decay: float = 1e-4,
        validation_interval: int = 5,
        log: Callable[[str], None] | None = _LOG.info,
        data_mode: str = "random_bits",
        optimizer: str = "sgd",
        grad_clip: float = 0.0,
        metrics: MetricsRegistry = REGISTRY,
    ) -> dict[str, Any]:
        """SNR-mixed training loop (defaults mirror main.py:33-42).

        data_mode: "random_bits" — the reference package protocol
        (trainer.py:85-86; trains the model as a denoiser since random bits
        are not codewords, SURVEY.md §2 note 10); "zero_codewords" — the
        reference notebook protocol (cell 11 train_decoder), valid for
        sign-symmetric decoders; "random_codewords" — encoder-based
        training (requires ``encoder=`` at construction), the only honest
        mode for non-symmetric models like the message GNN.
        """
        if snr_range is None:
            snr_range = [-2.0, 0.0, 2.0, 4.0]
        snr_range = [float(s) for s in snr_range]
        if optimizer == "sgd":  # the reference optimizer (trainer.py:70)
            opt = optax.sgd(learning_rate, momentum=momentum)
        elif optimizer == "adam":
            opt = optax.adam(learning_rate)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        parts = [optax.add_decayed_weights(weight_decay), opt]
        if grad_clip > 0:
            parts.insert(0, optax.clip_by_global_norm(grad_clip))
        tx = optax.chain(*parts)
        opt_state = tx.init(self.params)

        if data_mode == "random_codewords" and self.encoder is None:
            raise ValueError("data_mode='random_codewords' requires encoder=")
        encoder = self.encoder

        @jax.jit
        def train_step(params, opt_state, key, snr_db):
            kb, kc = jax.random.split(key)
            if data_mode == "zero_codewords":
                bits = jnp.zeros((batch_size, self.n), jnp.float32)
            elif data_mode == "random_codewords":
                bits = encoder.random_codewords(kb, batch_size)
            else:
                bits = jax.random.bernoulli(kb, 0.5, (batch_size, self.n)).astype(jnp.float32)
            llr = self._channel(kc, bits, snr_db)

            def loss_fn(p):
                _, loss = self.model.apply(p, llr, self.plan, bits)
                return loss.mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for epoch in range(num_epochs):
            epoch_loss, nb = 0.0, 0
            for snr_db in snr_range:
                self.data_key, sub = jax.random.split(self.data_key)
                self.params, opt_state, loss = train_step(
                    self.params, opt_state, sub, jnp.float32(snr_db)
                )
                epoch_loss += float(loss)
                nb += 1
            self.train_losses.append(epoch_loss / nb)
            metrics.record("train_loss", epoch_loss / nb)
            metrics.count("train_steps", nb)
            if log:
                log(f"epoch {epoch + 1}/{num_epochs} loss {epoch_loss / nb:.6f}")
            if (epoch + 1) % validation_interval == 0:
                vl, ber, fer = self.validate(batch_size, snr_range, data_mode)
                self.val_losses.append(vl)
                self.ber_history.append(ber)
                self.fer_history.append(fer)
                metrics.record("val_loss", vl)
                metrics.gauge("val_ber", ber)
                metrics.gauge("val_fer", fer)
                if log:
                    log(f"  val loss {vl:.6f} ber {ber:.6f} fer {fer:.6f}")
        return self.history()

    # -- production training (scan-fused) -----------------------------------

    def train_steps(
        self,
        num_steps: int,
        batch_size: int,
        learning_rate: float,
        snr_range=None,
        data_mode: str = "random_codewords",
        optimizer: str = "adam",
        weight_decay: float = 0.0,
        grad_clip: float = 0.0,
        scan_steps: int = 100,
        lr_schedule: str = "cosine",
        warmup_steps: int = 0,
        log: Callable[[str], None] | None = None,
        checkpoint_fn: Callable[[], None] | None = None,
        metrics: MetricsRegistry = REGISTRY,
    ) -> dict[str, Any]:
        """Large-budget training: ``lax.scan`` fuses ``scan_steps`` optimizer
        steps into one compiled device call.

        The reference loop (and :meth:`train`, which keeps its shape) fetches
        the loss every step — one host<->device round-trip per step, which on
        a remote TPU is latency-bound, not compute-bound.  Here the whole
        chunk runs on-device (per-step SNR sampled uniformly over
        [min(snr_range), max(snr_range)], fresh PRNG per step) and only the
        per-chunk loss vector crosses the wire.  Buffers are donated, so
        params/optimizer state never round-trip at all.

        Resumable: optimizer state and step count live on ``self`` and are
        included in :meth:`save_state`/:meth:`load_state` checkpoints.
        ``checkpoint_fn`` (if given) runs after every chunk.
        """
        if snr_range is None:
            snr_range = [-2.0, 0.0, 2.0, 4.0]
        lo, hi = float(min(snr_range)), float(max(snr_range))
        if lr_schedule == "cosine":
            sched = optax.warmup_cosine_decay_schedule(
                0.0, learning_rate, max(warmup_steps, 1), max(num_steps, 2)
            )
        elif lr_schedule == "constant":
            sched = learning_rate
        else:
            raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
        if optimizer == "adam":
            opt = optax.adam(sched)
        elif optimizer == "sgd":
            opt = optax.sgd(sched, momentum=0.9)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r}")
        parts = [optax.add_decayed_weights(weight_decay), opt]
        if grad_clip > 0:
            parts.insert(0, optax.clip_by_global_norm(grad_clip))
        tx = optax.chain(*parts)
        if self.opt_state is None:
            self.opt_state = tx.init(self.params)
            pending = getattr(self, "_pending_opt_state", None)
            if pending is not None:  # load_state ran before the first train_steps
                self.opt_state = serialization.from_state_dict(self.opt_state, pending)
                self._pending_opt_state = None
            else:
                self.step = 0
        if data_mode == "random_codewords" and self.encoder is None:
            raise ValueError("data_mode='random_codewords' requires encoder=")
        encoder = self.encoder

        def one_step(carry, _):
            params, opt_state, key = carry
            key, kb, kc, ks = jax.random.split(key, 4)
            snr_db = jax.random.uniform(ks, (), minval=lo, maxval=hi)
            if data_mode == "zero_codewords":
                bits = jnp.zeros((batch_size, self.n), jnp.float32)
            elif data_mode == "random_codewords":
                bits = encoder.random_codewords(kb, batch_size)
            else:
                bits = jax.random.bernoulli(kb, 0.5, (batch_size, self.n)).astype(jnp.float32)
            llr = self._channel(kc, bits, snr_db)

            def loss_fn(p):
                _, loss = self.model.apply(p, llr, self.plan, bits)
                return loss.mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key), loss

        @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("k",))
        def chunk(params, opt_state, key, k):
            (params, opt_state, _), losses = jax.lax.scan(
                one_step, (params, opt_state, key), length=k
            )
            return params, opt_state, losses

        while self.step < num_steps:
            k = min(scan_steps, num_steps - self.step)
            self.data_key, sub = jax.random.split(self.data_key)
            t0 = time.time()
            self.params, self.opt_state, losses = chunk(
                self.params, self.opt_state, sub, k
            )
            losses = np.asarray(losses)  # value fetch = real synchronization
            self.train_losses.extend(float(x) for x in losses)
            self.step += k
            metrics.record("train_loss", float(losses.mean()))
            metrics.count("train_steps", k)
            metrics.gauge("train_steps_per_s", k / max(time.time() - t0, 1e-9))
            if log:
                log(f"step {self.step}/{num_steps} loss {losses.mean():.6f}")
            if checkpoint_fn is not None:
                checkpoint_fn()
        return self.history()

    def validate(self, batch_size: int, snr_range,
                 data_mode: str = "random_bits") -> tuple[float, float, float]:
        """Validation across SNRs (reference trainer.py:142-200); data
        generation follows ``data_mode`` like training."""
        total_l = total_ber = total_fer = 0.0
        for i, snr_db in enumerate(snr_range):
            key = jax.random.fold_in(jax.random.PRNGKey(1234), i)
            kb, kc = jax.random.split(key)
            if data_mode == "zero_codewords":
                bits = jnp.zeros((batch_size, self.n), jnp.float32)
            elif data_mode == "random_codewords":
                bits = self.encoder.random_codewords(kb, batch_size)
            else:
                bits = jax.random.bernoulli(kb, 0.5, (batch_size, self.n)).astype(jnp.float32)
            llr = self._channel(kc, bits, snr_db)
            soft, loss = self.model.apply(self.params, llr, self.plan, bits)
            hard = (soft > 0.5).astype(jnp.float32)
            ber, fer = ch.compute_ber_fer(bits, hard)
            total_l += float(loss.mean())
            total_ber += float(ber)
            total_fer += float(fer)
        k = len(snr_range)
        return total_l / k, total_ber / k, total_fer / k

    # -- Monte-Carlo evaluation --------------------------------------------

    def evaluate_snr_range(
        self, snr_range, batch_size: int, num_trials: int, seed: int = 4321,
        use_encoder: bool = False,
    ) -> tuple[list[float], list[float]]:
        """MC sweep: all-zero codewords (reference trainer.py:202-262) or,
        with ``use_encoder=True``, random codewords via ``self.encoder``.

        Deterministic per-(snr, trial) key derivation: results are a pure
        function of (seed, snr index, trial index) — the property multi-chip
        sharding relies on (SURVEY.md §7 hard part 5).
        """
        encoder = self.encoder if use_encoder else None

        @jax.jit
        def trial(params, key, snr_db):
            if encoder is None:
                bits = jnp.zeros((batch_size, self.n))
                kc = key
            else:
                kb, kc = jax.random.split(key)
                bits = encoder.random_codewords(kb, batch_size)
            llr = self._channel(kc, bits, snr_db)
            soft, _ = self.model.apply(params, llr, self.plan)
            hard = (soft > 0.5).astype(jnp.float32)
            return ch.error_counts(bits, hard)

        bers, fers = [], []
        base = jax.random.PRNGKey(seed)
        for i, snr_db in enumerate(snr_range):
            be = fe = nb = nf = 0.0
            for t in range(num_trials):
                key = jax.random.fold_in(jax.random.fold_in(base, i), t)
                b, f, tb, tf = trial(self.params, key, jnp.float32(snr_db))
                be += float(b)
                fe += float(f)
                nb += float(tb)
                nf += float(tf)
            bers.append(be / nb)
            fers.append(fe / nf)
        return bers, fers

    # -- persistence -------------------------------------------------------

    def history(self) -> dict[str, Any]:
        return {
            "train_losses": self.train_losses,
            "val_losses": self.val_losses,
            "ber_history": self.ber_history,
            "fer_history": self.fer_history,
        }

    def save_model(self, path: str | Path) -> None:
        """Checkpoint params + history (payload parity with trainer.py:337-350)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "params": serialization.to_state_dict(self.params),
            "history": {k: np.asarray(v, dtype=np.float64) for k, v in self.history().items()},
        }
        path.write_bytes(serialization.msgpack_serialize(payload))

    def load_model(self, path: str | Path) -> None:
        payload = serialization.msgpack_restore(Path(path).read_bytes())
        self.params = serialization.from_state_dict(self.params, payload["params"])
        hist = payload.get("history", {})
        self.train_losses = list(np.asarray(hist.get("train_losses", [])))
        self.val_losses = list(np.asarray(hist.get("val_losses", [])))
        self.ber_history = list(np.asarray(hist.get("ber_history", [])))
        self.fer_history = list(np.asarray(hist.get("fer_history", [])))

    def save_state(self, path: str | Path) -> None:
        """Full resumable checkpoint: params + optimizer state + step +
        history + the data-PRNG key (a :meth:`train_steps` run interrupted
        and resumed from this file continues the identical trajectory)."""
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "params": serialization.to_state_dict(self.params),
            "opt_state": serialization.to_state_dict(self.opt_state),
            "step": self.step,
            "data_key": np.asarray(self.data_key),
            "history": {k: np.asarray(v, dtype=np.float64) for k, v in self.history().items()},
        }
        tmp = path.with_suffix(path.suffix + ".tmp")
        tmp.write_bytes(serialization.msgpack_serialize(payload))
        tmp.replace(path)  # atomic: a mid-write kill never corrupts the checkpoint

    def load_state(self, path: str | Path) -> None:
        """Restore a :meth:`save_state` checkpoint.  ``self.opt_state`` must
        already be a template of the right structure (call ``train_steps``
        with ``num_steps=0`` first, or pass the same optimizer config)."""
        payload = serialization.msgpack_restore(Path(path).read_bytes())
        self.params = serialization.from_state_dict(self.params, payload["params"])
        if self.opt_state is not None and payload.get("opt_state") is not None:
            self.opt_state = serialization.from_state_dict(self.opt_state, payload["opt_state"])
        self._pending_opt_state = payload.get("opt_state")
        self.step = int(payload["step"])
        self.data_key = jnp.asarray(payload["data_key"], dtype=jnp.uint32)
        hist = payload.get("history", {})
        self.train_losses = list(np.asarray(hist.get("train_losses", [])))
        self.val_losses = list(np.asarray(hist.get("val_losses", [])))
        self.ber_history = list(np.asarray(hist.get("ber_history", [])))
        self.fer_history = list(np.asarray(hist.get("fer_history", [])))

    def save_history_json(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.history(), indent=2))

    # -- orbax-managed checkpoints (retention + step numbering) --------------

    def save_checkpoint(self, mgr) -> None:
        """Save the full resumable state through a
        :class:`ldpc_tpu.training.checkpoint.CheckpointManager` (orbax:
        step-numbered directories, retention of the last N; same payload as
        :meth:`save_state`)."""
        mgr.save(
            self.step,
            params=self.params,
            opt_state=serialization.to_state_dict(self.opt_state),
            history={
                # orbax rejects zero-size arrays; empty histories are dropped
                # and restored as [] by load_checkpoint.
                **{k: np.asarray(v, dtype=np.float64)
                   for k, v in self.history().items() if len(v)},
                "step": np.asarray(self.step),
                "data_key": np.asarray(self.data_key),
            },
        )

    def load_checkpoint(self, mgr, step: int | None = None) -> None:
        """Restore the latest (or a given) step saved by :meth:`save_checkpoint`."""
        payload = mgr.restore(step)
        self.params = serialization.from_state_dict(self.params, payload["params"])
        if self.opt_state is not None and payload.get("opt_state") is not None:
            self.opt_state = serialization.from_state_dict(self.opt_state, payload["opt_state"])
        self._pending_opt_state = payload.get("opt_state")
        hist = payload.get("history", {})
        self.step = int(hist["step"])
        self.data_key = jnp.asarray(hist["data_key"], dtype=jnp.uint32)
        for name in ("train_losses", "val_losses", "ber_history", "fer_history"):
            setattr(self, name, [float(x) for x in np.asarray(hist.get(name, []))])

    # -- plotting (API parity with reference trainer.py:264-335) -----------

    def plot_training_history(self):
        from ldpc_tpu.visualization.plots import plot_training_history

        return plot_training_history(self.history())

    def plot_snr_performance(self, snr_range, ber_results, fer_results,
                             comparison_ber=None, comparison_fer=None):
        import matplotlib.pyplot as plt

        fig1, ax1 = plt.subplots(figsize=(8, 5))
        ax1.semilogy(snr_range, ber_results, "o-", label="Neural decoder")
        if comparison_ber is not None:
            ax1.semilogy(snr_range, comparison_ber, "s-", label="Conventional decoder")
        ax1.set_xlabel("SNR (dB)")
        ax1.set_ylabel("BER")
        ax1.legend()
        ax1.grid(True)
        fig2, ax2 = plt.subplots(figsize=(8, 5))
        ax2.semilogy(snr_range, fer_results, "o-", label="Neural decoder")
        if comparison_fer is not None:
            ax2.semilogy(snr_range, comparison_fer, "s-", label="Conventional decoder")
        ax2.set_xlabel("SNR (dB)")
        ax2.set_ylabel("FER")
        ax2.legend()
        ax2.grid(True)
        return fig1, fig2
