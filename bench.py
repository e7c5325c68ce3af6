"""Headline benchmark: decoded bits/s/chip, min-sum + message-GNN, 20 iterations.

Prints JSON lines of the form {"metric", "value", "unit", "vs_baseline",
"details"}; the LAST line is the complete combined result.  A cumulative
line is emitted after every section so that a mid-run TPU hang (the
documented no-holder relay wedge, docs/PERFORMANCE.md "TPU tunnel
wedge") can never erase the headline min-sum number.

Wedge-proofing (VERDICT r2 item 2):
* the orchestrator process never imports jax — it probes the TPU relay in
  a bounded subprocess first (retrying once), and only then runs each
  benchmark section as its own subprocess under a hard timeout;
* if the relay is wedged, sections run on CPU (flagged
  ``backend: "cpu-fallback"`` in details) rather than hanging to rc=124;
* a hung/failed section is skipped with a note; every completed section's
  numbers survive.

Baseline (vs_baseline denominator): the reference PyTorch
``MinSumScaledDecoder`` (`models/traditional_decoders.py:137-285`) measured
on NR_2_0_32 (Z=32), batch 32 (its own eval protocol batch,
`comparative_evaluation.py:42`), 20 iterations, no early stop, CPU:
666.43 bits/s (79.9 s per batch; measured 2026-08-17 on this machine —
the reference publishes no numbers, BASELINE.md).

Self-test of the hang path: LDPC_BENCH_SIMULATE_HANG=<section> makes that
section sleep past its timeout; the min-sum line must still be printed.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REF_BITS_PER_S = 666.43

CODE = "nr_2_0_32"
Z = 32
ITERS = 20
MINSUM_BATCH = 65536
# 2048 = the documented headline configuration (docs/PERFORMANCE.md roofline
# table); the round-3 bench ran 512 and under-reported the kernel by ~40%
# (VERDICT r3 weak #1 — GNN throughput is batch-dependent).
GNN_BATCH = 2048
GNN_HIDDEN = 64

PROBE_TIMEOUT_S = 120
PROBE_ATTEMPTS = 2
# Per-section wall budgets.  The GNN/z384 kernels take several minutes to
# compile cold (fori_loop bodies with K=197 unrolled edge programs); the
# persistent compilation cache (JAX_COMPILATION_CACHE_DIR below) makes
# warm runs take seconds, so these budgets only bite on a cold cache or a
# mid-run wedge — and every completed section's line survives either way.
SECTION_TIMEOUTS = {"minsum": 600, "msg_gnn": 900, "corrected_gnn": 700,
                    "corrected_z32": 900, "z384": 700}
SECTION_ORDER = ["minsum", "msg_gnn", "corrected_gnn", "corrected_z32", "z384"]
# Test hook: scale all section budgets (e.g. 0.05 in the simulated-hang test).
_TSCALE = float(os.environ.get("LDPC_BENCH_TIMEOUT_SCALE", "1"))


def _batches():
    """CPU fallback shrinks batches so sections finish inside their budgets
    (the XLA scan path is ~65x slower than the fused TPU kernels)."""
    import jax

    if jax.default_backend() == "tpu":
        return MINSUM_BATCH, GNN_BATCH
    return 2048, 64


# --------------------------------------------------------------------------
# Section implementations (run in child processes; jax imported only here)
# --------------------------------------------------------------------------

def _time_fn(fn, reps=10, windows=3, gap_s=2.0):
    """Phase-proof timing: several separated queue-saturated windows.

    Timing discipline for remote/tunneled backends: block_until_ready
    can return before real device execution completes, so (a) saturate
    the queue with back-to-back dispatches and (b) synchronize with an
    actual VALUE fetch of the last result, which cannot be elided.

    Device-phase variance on this TPU is bimodal (±30%,
    docs/PERFORMANCE.md) and the relay occasionally serves one
    pathological slow stretch (the round-4 driver's corrected_z32 sample
    was 25× below its band while the same code measured in-band before
    and after — VERDICT r4 weak #1/#5).  A single contiguous window
    turns such a stretch into the reported number; median-of-windows
    with the full per-window record keeps it visible but not decisive.
    If the window spread exceeds 3×, two extra windows are sampled so
    the median settles in the true band.

    ``reps`` is the TOTAL rep budget, split across the windows, so the
    timed cost matches the old single-window discipline.

    Returns ``(median window seconds/rep, last output, stats dict)``.
    """
    import jax

    per_win = max(1, round(reps / windows))

    def one_window(w):
        t0 = time.time()
        outs = [fn(1000 * w + 100 + i) for i in range(per_win)]
        _ = [float(x) for x in jax.tree_util.tree_leaves(outs[-1])]
        return (time.time() - t0) / per_win, outs[-1]

    outs = [fn(i) for i in range(2)]  # warmup (compile + steady)
    _ = [float(x) for x in jax.tree_util.tree_leaves(outs[-1])]
    means, out = [], None
    for w in range(windows):
        if w:
            time.sleep(gap_s)
        dt, out = one_window(w)
        means.append(dt)
    if len(means) > 1 and max(means) > 3 * min(means):
        for w in range(windows, windows + 2):
            time.sleep(gap_s)
            dt, out = one_window(w)
            means.append(dt)
    med = sorted(means)[len(means) // 2]
    stats = {
        "window_ms": [round(m * 1e3, 2) for m in means],
        "ms_min": round(min(means) * 1e3, 2),
        "ms_median": round(med * 1e3, 2),
    }
    return med, out, stats


def section_minsum() -> dict:
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.classical import decode_min_sum
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.ops.pallas_minsum import make_fused_minsum
    from ldpc_tpu.utils import bpsk_awgn_llr
    from ldpc_tpu.utils.metrics import decode_throughput

    qc = qc_layout(get_base_graph(CODE), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    on_tpu = jax.default_backend() == "tpu"
    B = _batches()[0]
    fused = make_fused_minsum(qc, ITERS, 0.75, batch_tile=128) if on_tpu else None

    @partial(jax.jit, static_argnames=("B",))
    def minsum_pipe(key, B):
        llr = bpsk_awgn_llr(key, jnp.zeros((B, n)), 3.0)
        if fused is not None:
            bits, conv = fused(llr)
            return bits.sum(), conv.astype(jnp.float32).mean()
        res = decode_min_sum(llr, plan, ITERS, 0.75)
        return res.bits.sum(), res.conv_iter.astype(jnp.float32).mean()

    dt, (err, iters), tstats = _time_fn(lambda i: minsum_pipe(jax.random.PRNGKey(i), B))
    bps = decode_throughput(B, n, dt, name="minsum")
    return {
        "minsum_bits_per_s": round(bps, 1),
        "minsum_kernel": "pallas_fused" if fused is not None else "xla_scan",
        "minsum_batch": B,
        "minsum_ms_per_batch": round(dt * 1e3, 2),
        "minsum_timing": tstats,
        "minsum_bit_errors_at_3db": float(err),
        "minsum_mean_conv_iters": round(float(iters), 2),
        "backend": jax.default_backend(),
    }


def section_msg_gnn() -> dict:
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.message_gnn import create_message_gnn_decoder
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.utils import bpsk_awgn_llr
    from ldpc_tpu.utils.metrics import decode_throughput

    qc = qc_layout(get_base_graph(CODE), Z)
    plan = qc_msg.make_plan(qc)
    n = plan.C * plan.Z
    on_tpu = jax.default_backend() == "tpu"
    B = _batches()[1]

    model = create_message_gnn_decoder(plan, num_iterations=ITERS, hidden_dim=GNN_HIDDEN)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, n)), plan)
    if on_tpu:
        # v2 is the most consistent winner at this exact config across
        # repeated 2026-08-21 runs (18.8-20.0 Mbit/s vs v1 15.0-17.3, v4
        # 16.2-20.3; docs/PERFORMANCE.md "kernel variants" table + the
        # device-phase variance note).
        from ldpc_tpu.ops.pallas_gnn import make_fused_gnn_decoder_v2

        gnn_soft = make_fused_gnn_decoder_v2(
            qc, params, num_iterations=ITERS, hidden_dim=GNN_HIDDEN
        )
    else:
        gnn_soft = None

    @partial(jax.jit, static_argnames=("B",))
    def gnn_pipe(params, key, B):
        llr = bpsk_awgn_llr(key, jnp.zeros((B, n)), 3.0)
        if gnn_soft is not None:
            soft = gnn_soft(llr)
        else:
            soft, _ = model.apply(params, llr, plan)
        return (soft > 0.5).astype(jnp.float32).sum()

    dt, _, tstats = _time_fn(lambda i: gnn_pipe(params, jax.random.PRNGKey(i), B), reps=5)
    bps = decode_throughput(B, n, dt, name="msg_gnn")
    return {
        "msg_gnn_bits_per_s": round(bps, 1),
        "msg_gnn_kernel": "pallas_fused" if gnn_soft is not None else "xla",
        "msg_gnn_hidden": GNN_HIDDEN,
        "msg_gnn_batch": B,
        "msg_gnn_timing": tstats,
    }


def section_corrected_gnn() -> dict:
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.utils import bpsk_awgn_llr
    from ldpc_tpu.utils.metrics import decode_throughput

    if jax.default_backend() != "tpu":
        return {"corrected_gnn_early_exit_bits_per_s": None}
    ckpt = Path("results/corrected_gnn_nr_2_0_4.msgpack")
    if not ckpt.exists():
        return {"corrected_gnn_early_exit_bits_per_s": None}

    from flax import serialization

    from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder
    from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2

    qc4 = qc_layout(get_base_graph("nr_2_0_4"), 4)
    plan4 = qc_msg.make_plan(qc4)
    n4 = plan4.C * plan4.Z
    m4 = create_corrected_minsum_gnn_decoder(
        plan4, num_iterations=5, hidden_dim=64, input_injection=True
    )
    payload = serialization.msgpack_restore(ckpt.read_bytes())
    p4 = serialization.from_state_dict(
        m4.init(jax.random.PRNGKey(0), jnp.zeros((2, n4)), plan4),
        payload["params"],
    )
    corr = make_fused_corrected_gnn_decoder_v2(
        qc4, p4, num_iterations=5, hidden_dim=64, early_exit=True
    )

    @jax.jit
    def corr_pipe(key):
        llr = bpsk_awgn_llr(key, jnp.zeros((4096, n4)), 3.0)
        return (corr(llr) > 0.5).astype(jnp.float32).sum()

    dt, _, tstats = _time_fn(lambda i: corr_pipe(jax.random.PRNGKey(i)), reps=5)
    bps = decode_throughput(4096, n4, dt, name="corrected_gnn")
    return {"corrected_gnn_early_exit_bits_per_s": round(bps, 1),
            "corrected_gnn_timing": tstats}


def section_corrected_z32() -> dict:
    """Serving throughput of the Z=32 flagship quality configuration (the
    corrected min-sum GNN T=10 h=64 whose BER artifact is
    results/nr_2_0_32_corrected10_ft3_highprecision.json), through the
    corrected-v2 kernel with syndrome early exit — VERDICT r3 item 5."""
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.ops import qc_msg
    from ldpc_tpu.utils import bpsk_awgn_llr
    from ldpc_tpu.utils.metrics import decode_throughput

    if jax.default_backend() != "tpu":
        return {"corrected_z32_early_exit_bits_per_s": None}
    ckpt = next(
        (Path(f"results/corrected10_gnn_nr_2_0_32{s}.msgpack")
         for s in ("_ft3", "_ft2", "")
         if Path(f"results/corrected10_gnn_nr_2_0_32{s}.msgpack").exists()),
        None,
    )
    if ckpt is None:
        return {"corrected_z32_early_exit_bits_per_s": None}

    from flax import serialization

    from ldpc_tpu.models.message_gnn import create_corrected_minsum_gnn_decoder
    from ldpc_tpu.ops.pallas_gnn import make_fused_corrected_gnn_decoder_v2

    qc32 = qc_layout(get_base_graph(CODE), Z)
    plan32 = qc_msg.make_plan(qc32)
    n32 = plan32.C * plan32.Z
    m32 = create_corrected_minsum_gnn_decoder(
        plan32, num_iterations=10, hidden_dim=64, input_injection=True
    )
    payload = serialization.msgpack_restore(ckpt.read_bytes())
    p32 = serialization.from_state_dict(
        m32.init(jax.random.PRNGKey(0), jnp.zeros((2, n32)), plan32),
        payload["params"],
    )
    corr = make_fused_corrected_gnn_decoder_v2(
        qc32, p32, num_iterations=10, hidden_dim=64, early_exit=True,
        return_iterations=True,
    )

    @jax.jit
    def corr_pipe(key):
        # 0 dB: top of the flagship's training window (operating region).
        llr = bpsk_awgn_llr(key, jnp.zeros((GNN_BATCH, n32)), 0.0)
        soft, iters = corr(llr)
        return ((soft > 0.5).astype(jnp.float32).sum(),
                iters.astype(jnp.float32).mean())

    dt, (_, mean_iters), tstats = _time_fn(
        lambda i: corr_pipe(jax.random.PRNGKey(i)), reps=5
    )
    bps = decode_throughput(GNN_BATCH, n32, dt, name="corrected_z32")
    out = {
        "corrected_z32_early_exit_bits_per_s": round(bps, 1),
        "corrected_z32_ckpt": ckpt.name,
        "corrected_z32_mean_iters": round(float(mean_iters), 2),
        "corrected_z32_timing": tstats,
    }

    # Round-5 depth-grown flagship (T=20): serve it too when present, so the
    # best quality configuration has a driver-captured throughput.
    ckpt20 = next(
        (Path(f"results/corrected20_gnn_nr_2_0_32{s}.msgpack")
         for s in ("_ft", "")
         if Path(f"results/corrected20_gnn_nr_2_0_32{s}.msgpack").exists()),
        None,
    )
    if ckpt20 is not None:
        m20 = create_corrected_minsum_gnn_decoder(
            plan32, num_iterations=20, hidden_dim=64, input_injection=True
        )
        p20 = serialization.from_state_dict(
            m20.init(jax.random.PRNGKey(0), jnp.zeros((2, n32)), plan32),
            serialization.msgpack_restore(ckpt20.read_bytes())["params"],
        )
        corr20 = make_fused_corrected_gnn_decoder_v2(
            qc32, p20, num_iterations=20, hidden_dim=64, early_exit=True,
            return_iterations=True,
        )

        @jax.jit
        def corr20_pipe(key):
            llr = bpsk_awgn_llr(key, jnp.zeros((GNN_BATCH, n32)), 0.0)
            soft, iters = corr20(llr)
            return ((soft > 0.5).astype(jnp.float32).sum(),
                    iters.astype(jnp.float32).mean())

        dt20, (_, mi20), ts20 = _time_fn(
            lambda i: corr20_pipe(jax.random.PRNGKey(i)), reps=5
        )
        out.update({
            "corrected20_z32_early_exit_bits_per_s": round(
                decode_throughput(GNN_BATCH, n32, dt20, name="corrected20_z32"), 1
            ),
            "corrected20_z32_ckpt": ckpt20.name,
            "corrected20_z32_mean_iters": round(float(mi20), 2),
            "corrected20_z32_timing": ts20,
        })
    return out


def section_z384() -> dict:
    import jax
    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.utils import bpsk_awgn_llr
    from ldpc_tpu.utils.metrics import decode_throughput

    if jax.default_backend() != "tpu":
        return {"z384_zlane_bits_per_s": None}
    from ldpc_tpu.ops.pallas_minsum import make_fused_minsum_zlane

    qc384 = qc_layout(get_base_graph(CODE), 384)
    n384 = qc384.num_base_cols * 384
    zfused = make_fused_minsum_zlane(qc384, ITERS, 0.75)

    @jax.jit
    def zlane_pipe(key):
        llr = bpsk_awgn_llr(key, jnp.zeros((512, n384)), 3.0)
        bits, conv = zfused(llr)
        return bits.sum(), conv.astype(jnp.float32).mean()

    dt, _, tstats = _time_fn(lambda i: zlane_pipe(jax.random.PRNGKey(i)), reps=5)
    bps = decode_throughput(512, n384, dt, name="z384_zlane")
    return {"z384_zlane_bits_per_s": round(bps, 1),
            "z384_zlane_timing": tstats}


SECTION_FNS = {
    "minsum": section_minsum,
    "msg_gnn": section_msg_gnn,
    "corrected_gnn": section_corrected_gnn,
    "corrected_z32": section_corrected_z32,
    "z384": section_z384,
}


def run_section(name: str) -> None:
    """Child-process entry: run one section, print its JSON dict last."""
    import contextlib

    if os.environ.get("LDPC_BENCH_CPU_FALLBACK"):
        # The host sitecustomize force-registers the TPU platform, so the
        # JAX_PLATFORMS env var alone cannot deselect it — the config update
        # must run before the backend initializes.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ldpc_tpu.utils.profiling import trace

    if os.environ.get("LDPC_BENCH_SIMULATE_HANG") == name:
        time.sleep(10_000)
    with contextlib.ExitStack() as stack:
        # LDPC_TPU_TRACE=<dir> captures a jax.profiler device trace.
        trace_dir = os.environ.get("LDPC_TPU_TRACE")
        if trace_dir:
            stack.enter_context(trace(os.path.join(trace_dir, name)))
        result = SECTION_FNS[name]()
    from ldpc_tpu.utils.metrics import REGISTRY

    result["_gauges"] = REGISTRY.snapshot()["gauges"]
    print("\n" + json.dumps(result), flush=True)


# --------------------------------------------------------------------------
# Orchestrator (parent process; never imports jax)
# --------------------------------------------------------------------------

def probe_tpu_once(timeout_s: float | None = None) -> bool:
    """One bounded TPU-relay liveness probe (the wedge hangs inside device
    init, so it must run in a killable subprocess — docs/PERFORMANCE.md)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform == 'tpu'"],
            timeout=timeout_s or PROBE_TIMEOUT_S * _TSCALE, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def probe_tpu() -> bool:
    for attempt in range(PROBE_ATTEMPTS):
        if probe_tpu_once():
            return True
        print(f"# tpu probe attempt {attempt + 1} failed", file=sys.stderr, flush=True)
    return False


def emit(details: dict, final: bool) -> None:
    bps = details.get("minsum_bits_per_s")
    line = {
        "metric": "minsum_decoded_bits_per_s_per_chip",
        "value": bps,
        "unit": "bits/s",
        "vs_baseline": round(bps / REF_BITS_PER_S, 1) if bps else None,
        "details": {
            "code": CODE, "Z": Z, "iterations": ITERS,
            "baseline_bits_per_s": REF_BITS_PER_S,
            "partial": not final,
            **{k: v for k, v in details.items() if k != "minsum_bits_per_s"},
        },
    }
    print(json.dumps(line), flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--section":
        run_section(sys.argv[2])
        return

    # Persistent compilation cache: sections (and future bench runs) reuse
    # each other's TPU compilations.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ldpc_tpu_jax_cache")

    env = dict(os.environ)
    if env.get("JAX_PLATFORMS") == "cpu":
        env["LDPC_BENCH_CPU_FALLBACK"] = "1"  # forced CPU (tests): skip probe
    elif not probe_tpu():
        print("# TPU relay wedged -> CPU fallback", file=sys.stderr, flush=True)
        env["JAX_PLATFORMS"] = "cpu"
        env["LDPC_BENCH_CPU_FALLBACK"] = "1"

    details: dict = {}
    gauges: dict = {}
    if env.get("LDPC_BENCH_CPU_FALLBACK"):
        details["backend"] = "cpu-fallback"

    # Global wedge-wait budget: pre-section probes may spend at most this
    # much wall time waiting for a stalled relay before the run degrades to
    # CPU fallback for the remaining sections.
    wedge_budget = [480 * _TSCALE]

    def relay_ready(name: str) -> None:
        """Wait out a transient relay stall (bounded); degrade to CPU when
        the budget runs dry.  The relay wedges transiently, typically right
        after a long job exits (docs/PERFORMANCE.md); a cheap probe before
        each TPU section waits that out instead of burning the section's
        whole budget on a stall."""
        while True:
            t0 = time.time()
            if probe_tpu_once(timeout_s=60 * _TSCALE):
                return
            wedge_budget[0] -= time.time() - t0
            if wedge_budget[0] <= 0:
                print(f"# relay stalled before {name}, budget spent -> CPU "
                      "fallback", file=sys.stderr, flush=True)
                env["JAX_PLATFORMS"] = "cpu"
                env["LDPC_BENCH_CPU_FALLBACK"] = "1"
                details["backend"] = "cpu-fallback"
                return
            print(f"# relay stalled before {name}; waiting",
                  file=sys.stderr, flush=True)
            sleep_s = min(90 * _TSCALE, max(wedge_budget[0], 1))
            wedge_budget[0] -= sleep_s
            time.sleep(sleep_s)

    def run_one(name: str) -> None:
        """Run a section subprocess; record its payload or error."""
        if not env.get("LDPC_BENCH_CPU_FALLBACK"):
            relay_ready(name)
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--section", name],
                timeout=SECTION_TIMEOUTS[name] * _TSCALE,
                capture_output=True, text=True,
                env=env,
            )
            if r.returncode != 0:
                details[f"{name}_error"] = (r.stderr or "")[-400:].strip() or f"rc={r.returncode}"
            else:
                try:
                    payload = json.loads(r.stdout.strip().splitlines()[-1])
                    details.pop(f"{name}_error", None)  # retry succeeded
                except (IndexError, json.JSONDecodeError) as e:
                    # rc==0 but the last stdout line is not the payload —
                    # record it like any other section failure instead of
                    # crashing the orchestrator (the whole point of which
                    # is that completed sections' numbers survive).
                    details[f"{name}_error"] = f"unparseable section output: {e}"
                    payload = {}
                gauges.update(payload.pop("_gauges", {}))
                details.update(payload)
                if env.get("LDPC_BENCH_CPU_FALLBACK") and not os.environ.get(
                    "JAX_PLATFORMS"
                ):
                    # A wedge-triggered fallback must stay visible even
                    # after a section reports its own backend.
                    details["backend"] = "cpu-fallback"
        except subprocess.TimeoutExpired:
            details[f"{name}_error"] = (
                f"timeout after {SECTION_TIMEOUTS[name] * _TSCALE:g}s"
            )
        details[f"{name}_wall_s"] = round(time.time() - t0, 1)
        # Cumulative line after every section: a later hang cannot erase
        # the already-measured numbers (the driver keeps the last line).
        emit(details, final=False)

    for name in SECTION_ORDER:
        run_one(name)
    # One retry pass for sections lost to a transient stall: by the time
    # the first pass ends the relay has typically recovered (and the
    # compilation cache makes retries cheap).  Only when the relay answers
    # a probe — retrying into a dead relay would just double the loss.
    failed = [n for n in SECTION_ORDER if f"{n}_error" in details]
    if failed and not env.get("LDPC_BENCH_CPU_FALLBACK") and probe_tpu_once():
        for name in failed:
            print(f"# retrying {name}", file=sys.stderr, flush=True)
            run_one(name)
    details["metrics"] = gauges
    emit(details, final=True)


if __name__ == "__main__":
    main()
