"""Auxiliary subsystems: metrics, logging, profiling estimates, orbax
checkpointing, Eb/N0 conversion."""
import logging

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.models import make_standard_decoder
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.training.checkpoint import CheckpointManager
from ldpc_tpu.utils.channel import ebn0_to_esn0
from ldpc_tpu.utils.logging import debug_dumps_enabled, get_logger
from ldpc_tpu.utils.metrics import MetricsRegistry, decode_throughput
from ldpc_tpu.utils.profiling import minsum_roofline


class TestMetrics:
    def test_counters_gauges_series(self):
        m = MetricsRegistry()
        m.count("frames", 10)
        m.count("frames", 5)
        m.gauge("ber", 1e-3)
        with m.timer("decode"):
            pass
        snap = m.snapshot()
        assert snap["counters"]["frames"] == 15
        assert snap["gauges"]["ber"] == 1e-3
        assert len(snap["series"]["decode_s"]) == 1
        assert "frames: 15" in m.summary()

    def test_throughput(self):
        m = MetricsRegistry()
        bps = decode_throughput(100, 1664, 0.5, m)
        assert bps == pytest.approx(100 * 1664 / 0.5)
        assert m.gauges["decoded_bits_per_s"] == bps

    def test_throughput_named(self):
        m = MetricsRegistry()
        decode_throughput(10, 32, 0.1, m, name="minsum")
        assert "minsum_bits_per_s" in m.gauges

    def test_dump(self, tmp_path):
        m = MetricsRegistry()
        m.count("x")
        m.dump(tmp_path / "m.json")
        assert (tmp_path / "m.json").exists()


class TestLogging:
    def test_logger_singleton_handlers(self):
        a = get_logger("ldpc_tpu.test")
        b = get_logger("ldpc_tpu.test")
        assert a is b and len(a.handlers) == 1

    def test_debug_dumps_flag(self, monkeypatch):
        monkeypatch.setenv("LDPC_TPU_DEBUG_DUMPS", "1")
        assert debug_dumps_enabled()
        monkeypatch.delenv("LDPC_TPU_DEBUG_DUMPS")
        assert not debug_dumps_enabled()


class TestRoofline:
    def test_minsum_roofline(self):
        qc = qc_layout(get_base_graph("nr_2_0_32"), 32)
        rl = minsum_roofline(qc, 20)
        bounds = rl.bound_bits_per_s(qc.num_vars)
        # compute-bound well below memory-bound for this VMEM-resident kernel
        assert bounds["compute_bound_bits_per_s"] < bounds["memory_bound_bits_per_s"]
        # measured 2.6 Gbit/s should be within ~2x of the compute bound
        assert 1e9 < bounds["compute_bound_bits_per_s"] < 2e10


class TestCheckpoint:
    def test_save_restore_resume(self, tmp_path):
        plan = qc_msg.make_plan(qc_layout(get_base_graph("toy_4x8"), 4))
        model = make_standard_decoder(num_iterations=2)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, plan.C * plan.Z)), plan)
        tx = optax.sgd(0.01, momentum=0.9)
        opt_state = tx.init(params)
        mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
        mgr.save(1, params, opt_state, {"train_losses": [1.0]})
        mgr.save(2, params, opt_state, {"train_losses": [1.0, 0.9]})
        assert mgr.latest_step() == 2
        restored = mgr.restore(template={"params": params, "opt_state": opt_state,
                                         "history": {"train_losses": [0.0, 0.0]}})
        chex_equal = jax.tree_util.tree_all(
            jax.tree_util.tree_map(lambda a, b: bool(jnp.allclose(a, b)),
                                   restored["params"], params)
        )
        assert chex_equal
        assert restored["history"]["train_losses"][-1] == pytest.approx(0.9)
        mgr.close()

    def test_restore_empty_raises(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "empty")
        with pytest.raises(FileNotFoundError):
            mgr.restore()
        mgr.close()


def test_ebn0_conversion():
    # rate 1/2, QPSK: Es/N0 = Eb/N0 + 10log10(1) = Eb/N0
    assert float(ebn0_to_esn0(3.0, 0.5, 2)) == pytest.approx(3.0)
    # rate 1/5 BG2-ish, QPSK: offset 10log10(0.4) = -3.98 dB
    assert float(ebn0_to_esn0(3.0, 0.2, 2)) == pytest.approx(3.0 - 3.979, abs=1e-2)


class TestProfiler:
    def test_trace_context(self, tmp_path):
        import jax.numpy as jnp
        from ldpc_tpu.utils.profiling import annotate, trace

        with trace(tmp_path / "tr") as d:
            with annotate("unit-test-region"):
                jnp.arange(8).sum().block_until_ready()
        # a trace directory with at least one artifact was produced
        import pathlib
        files = list(pathlib.Path(d).rglob("*"))
        assert files


class TestObservabilityIntegration:
    """The registry/logger/orbax layer wired into real production paths
    (trainer, evaluator) — not just unit-tested in isolation."""

    @pytest.fixture(scope="class")
    def plan(self):
        return qc_msg.make_plan(qc_layout(get_base_graph("toy_4x8"), 4))

    def test_trainer_train_records_metrics(self, plan):
        from ldpc_tpu.training import LDPCDecoderTrainer

        m = MetricsRegistry()
        tr = LDPCDecoderTrainer(make_standard_decoder(num_iterations=2), plan, seed=0)
        tr.train(num_epochs=2, batch_size=8, learning_rate=0.01, snr_range=[3.0],
                 validation_interval=2, metrics=m)
        snap = m.snapshot()
        assert len(snap["series"]["train_loss"]) == 2
        assert snap["counters"]["train_steps"] == 2  # 1 snr x 2 epochs
        assert "val_ber" in snap["gauges"]

    def test_trainer_train_steps_records_metrics(self, plan):
        from ldpc_tpu.training import LDPCDecoderTrainer

        m = MetricsRegistry()
        tr = LDPCDecoderTrainer(make_standard_decoder(num_iterations=2), plan, seed=0)
        tr.train_steps(num_steps=10, batch_size=8, learning_rate=0.01,
                       snr_range=[2.0, 4.0], data_mode="random_bits",
                       scan_steps=5, metrics=m)
        snap = m.snapshot()
        assert snap["counters"]["train_steps"] == 10
        assert snap["gauges"]["train_steps_per_s"] > 0
        assert len(snap["series"]["train_loss"]) == 2  # one per chunk

    def test_evaluator_records_metrics(self, plan):
        from ldpc_tpu.training.evaluator import ComparativeEvaluator

        m = MetricsRegistry()
        ev = ComparativeEvaluator(plan, snr_range=[4.0], batch_size=8, num_trials=1)
        ev.add_min_sum(3)
        ev.evaluate_all(log=None, metrics=m)
        snap = m.snapshot()
        assert "eval_Min-Sum Scaled_bits_per_s" in snap["gauges"]
        assert len(snap["series"]["eval_Min-Sum Scaled_s"]) == 1

    def test_trainer_orbax_checkpoint_resume(self, plan, tmp_path):
        """Kill-and-resume through CheckpointManager reproduces the
        uninterrupted trajectory (the orbax twin of the msgpack
        save_state/load_state test)."""
        from ldpc_tpu.training import LDPCDecoderTrainer

        kw = dict(batch_size=8, learning_rate=0.01, snr_range=[3.0],
                  data_mode="random_bits", scan_steps=5, lr_schedule="constant")
        model = make_standard_decoder(num_iterations=2)

        ref = LDPCDecoderTrainer(model, plan, seed=7)
        ref.train_steps(num_steps=20, **kw)

        mgr = CheckpointManager(tmp_path / "orbax", max_to_keep=2)
        t1 = LDPCDecoderTrainer(model, plan, seed=7)
        t1.train_steps(num_steps=10, **kw)
        t1.save_checkpoint(mgr)
        assert mgr.latest_step() == 10

        t2 = LDPCDecoderTrainer(model, plan, seed=99)  # different seed: all restored
        t2.load_checkpoint(mgr)
        assert t2.step == 10
        t2.train_steps(num_steps=20, **kw)
        mgr.close()

        assert t2.train_losses == pytest.approx(ref.train_losses)
        same = jax.tree_util.tree_all(jax.tree_util.tree_map(
            lambda a, b: bool(jnp.allclose(a, b)), ref.params, t2.params))
        assert same


def test_bench_simulated_hang_keeps_minsum_line(tmp_path):
    """bench.py wedge-proofing (VERDICT r2 item 2): with one section hung
    past its budget, the orchestrator must still emit a final JSON line
    carrying the min-sum headline and a timeout note for the hung section.
    Runs on forced CPU (shrunken batches) with scaled-down budgets."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", LDPC_BENCH_SIMULATE_HANG="msg_gnn",
               LDPC_BENCH_TIMEOUT_SCALE="0.2")
    out = subprocess.run(
        [sys.executable, str(repo / "bench.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-500:]
    last = json.loads(out.stdout.strip().splitlines()[-1])
    assert last["value"] and last["value"] > 0  # min-sum headline survived
    assert "timeout" in last["details"]["msg_gnn_error"]
    assert last["details"]["backend"] in ("cpu", "cpu-fallback")


def test_bench_time_fn_multiwindow_stats():
    """bench._time_fn (VERDICT r4 weak #5): the total rep budget is split
    over separated windows, min/median/per-window stats are reported, and
    a >3x window spread triggers two extra windows so a single
    pathological stretch cannot become the reported number."""
    import importlib.util
    import sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = bench
    spec.loader.exec_module(bench)

    calls = []
    dt, out, stats = bench._time_fn(lambda i: calls.append(i) or 0.0,
                                    reps=6, windows=3, gap_s=0.0)
    assert out == 0.0
    assert len(stats["window_ms"]) == 3
    assert stats["ms_min"] <= stats["ms_median"]
    assert stats["ms_median"] == sorted(stats["window_ms"])[1]
    # warmup keys 0..1, then per-window keys 1000*w + 100 + i (2 reps each)
    assert calls[:2] == [0, 1]
    assert calls[2:] == [100, 101, 1100, 1101, 2100, 2101]

    # Pathological window: make window 0 slow -> 2 extra windows sampled.
    import time as _time

    slow = [True]

    def fn(i):
        if slow[0] and i < 1000:  # only window 0's keys
            _time.sleep(0.05)
        return 0.0

    dt, _, stats = bench._time_fn(fn, reps=6, windows=3, gap_s=0.0)
    assert len(stats["window_ms"]) == 5
    # the median must sit in the fast band, not on the slow window
    assert stats["ms_median"] < max(stats["window_ms"]) / 3


def test_grow_merge_copies_matching_subtrees_only():
    """tools/train_flagship.grow_merge (round-5 depth growth): leaves whose
    path+shape match the shallower donor are copied; deeper-model-only
    leaves (the new iteration layers) keep their fresh zero-init values;
    shape mismatches are left alone rather than silently broadcast."""
    import importlib.util
    import sys
    from pathlib import Path

    import numpy as np

    spec = importlib.util.spec_from_file_location(
        "train_flagship",
        Path(__file__).resolve().parent.parent / "tools" / "train_flagship.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["train_flagship"] = mod
    spec.loader.exec_module(mod)

    donor = {
        "layers_0": {"w": np.full((3, 2), 7.0), "b": np.ones((2,))},
        "alpha": np.asarray(0.8),
        "mismatched": np.zeros((4,)),
    }
    grown = {
        "layers_0": {"w": np.zeros((3, 2)), "b": np.zeros((2,))},
        "layers_1": {"w": np.zeros((3, 2)), "b": np.zeros((2,))},
        "alpha": np.asarray(0.0),
        "mismatched": np.ones((5,)),
    }
    stats = mod.grow_merge(grown, donor)
    assert stats == {"copied": 3, "kept_fresh": 3}
    np.testing.assert_array_equal(grown["layers_0"]["w"], donor["layers_0"]["w"])
    np.testing.assert_array_equal(grown["layers_0"]["b"], donor["layers_0"]["b"])
    assert float(grown["alpha"]) == 0.8
    # new layers untouched (zero-init = pure min-sum continuation)
    assert not grown["layers_1"]["w"].any()
    # shape mismatch: fresh value kept, not crashed or broadcast
    assert grown["mismatched"].shape == (5,) and grown["mismatched"].all()
