"""Regenerate the reference's BER/FER curves from its own PyTorch code,
paired bit-for-bit against this framework's decoders.

The reference publishes no benchmark numbers (BASELINE.md), so this harness
runs the reference's classical decoders (`models/traditional_decoders.py`)
through the reference's own channel (`utils/channel.py` qpsk_modulate /
awgn_channel / qpsk_demodulate, its sigma^2 = 1/SNR convention) on the
reference eval protocol (all-zero codewords, SNR grid, early stopping,
`main.py:39-52` / `comparative_evaluation.py:108-166`) — and feeds the SAME
LLR realizations to our `decode_bp` / `decode_min_sum`.  The artifact
records, per SNR point and per decoder:

* reference BER/FER (+ Wilson 95% CI on FER, cluster-robust 95% CI on BER),
* our BER/FER on identical noise,
* the bit/frame decision mismatch count between the two stacks.

With the torch-differential unit parity of tests/test_reference_parity.py,
mismatch == 0 makes "within Monte-Carlo confidence" exact: the curves are
equal by construction, and the CI quantifies the sampling error of the
published artifact itself.

Usage:
    PYTHONPATH=. python tools/reference_curves.py --code NR_2_0_4 --Z 4
    PYTHONPATH=. python tools/reference_curves.py --code NR_2_0_32 --Z 32 \
        --trials 25
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

REFERENCE_ROOT = "/root/reference"


def wilson_ci(k: int, n: int, z: float = 1.96) -> tuple[float, float]:
    """Wilson score 95% interval for a binomial proportion."""
    if n == 0:
        return (0.0, 1.0)
    p = k / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return (max(0.0, center - half), min(1.0, center + half))


def cluster_ci(per_frame_errs, bits_per_frame: int, z: float = 1.96):
    """95% CI for BER treating frames as clusters (bit errors arrive in
    frame-sized bursts, so bit-level binomial CIs are far too tight)."""
    import numpy as np

    e = np.asarray(per_frame_errs, dtype=np.float64)
    n = e.size
    mean = e.mean() / bits_per_frame
    se = e.std(ddof=1) / math.sqrt(n) / bits_per_frame if n > 1 else 0.0
    return (max(0.0, mean - z * se), mean + z * se)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--code", default="NR_2_0_4", help="file stem under '5G LDPC CODES'")
    ap.add_argument("--Z", type=int, default=4)
    ap.add_argument("--snr-lo", type=float, default=-2.0)
    ap.add_argument("--snr-hi", type=float, default=6.0)
    ap.add_argument("--snr-step", type=float, default=1.0)
    ap.add_argument("--trials", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--max-iter", type=int, default=50)
    ap.add_argument("--ms-alpha", type=float, default=0.75)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, REFERENCE_ROOT)
    import numpy as np
    import torch

    from ldpc_neural_decoder.models.traditional_decoders import (
        BeliefPropagationDecoder,
        MinSumScaledDecoder,
    )
    from ldpc_neural_decoder.utils.channel import (
        awgn_channel,
        qpsk_demodulate,
        qpsk_modulate,
    )
    from ldpc_neural_decoder.utils.ldpc_utils import (
        expand_base_matrix as ref_expand,
        load_base_matrix as ref_load,
    )

    import jax

    jax.config.update("jax_platforms", "cpu")  # torch-paced job; keep off the TPU tunnel
    import jax.numpy as jnp

    from ldpc_tpu.codes import get_base_graph, qc_layout
    from ldpc_tpu.models.classical import decode_bp, decode_min_sum
    from ldpc_tpu.ops import qc_msg

    # H from the reference's own loader/expander (authentic path)...
    base = ref_load(Path(REFERENCE_ROOT) / "5G LDPC CODES" / f"{args.code}.txt")
    H_ref = ref_expand(base, args.Z)
    # ...and our plan from the registry; verify they agree before measuring.
    plan = qc_msg.make_plan(qc_layout(get_base_graph(args.code.lower()), args.Z))
    from ldpc_tpu.codes import expand_base_matrix as our_expand

    np.testing.assert_array_equal(
        np.asarray(H_ref, dtype=np.int8),
        our_expand(get_base_graph(args.code.lower()), args.Z),
    )
    H = torch.tensor(np.asarray(H_ref), dtype=torch.float32)
    n = H.shape[1]

    decoders = {
        "Belief Propagation": {
            "ref": BeliefPropagationDecoder(H, args.max_iter, early_stopping=True),
            "ours": jax.jit(lambda llr: decode_bp(llr, plan, args.max_iter, early_exit=True).bits),
        },
        "Min-Sum Scaled": {
            "ref": MinSumScaledDecoder(H, args.max_iter, args.ms_alpha, early_stopping=True),
            "ours": jax.jit(
                lambda llr: decode_min_sum(
                    llr, plan, args.max_iter, args.ms_alpha, early_exit=True
                ).bits
            ),
        },
    }

    snrs = []
    v = args.snr_lo
    while v <= args.snr_hi + 1e-9:
        snrs.append(round(v, 6))
        v += args.snr_step

    out: dict = {
        "protocol": {
            "code": args.code, "Z": args.Z, "modulation": "qpsk",
            "convention": "reference_package (sigma^2 = 1/SNR)",
            "codewords": "all-zero", "trials": args.trials, "batch": args.batch,
            "max_iterations": args.max_iter, "ms_scaling_factor": args.ms_alpha,
            "source": "ldpc_neural_decoder @ /root/reference, torch "
                      + torch.__version__,
        },
        "snr_range": snrs,
        "decoders": {},
    }
    frames = args.trials * args.batch
    t_start = time.time()
    for name, d in decoders.items():
        ref_bit = []; ref_frame = []; ref_iters = []
        our_bit = []; our_frame = []; mismatch_bits = 0; mismatch_frames = 0
        per_frame = {s: [] for s in snrs}
        for si, snr in enumerate(snrs):
            rb = rf = ob = of = 0
            it_sum = 0.0
            for t in range(args.trials):
                torch.manual_seed(args.seed + 1000 * si + t)
                bits = torch.zeros((args.batch, n))
                llr = qpsk_demodulate(awgn_channel(qpsk_modulate(bits), snr), snr)
                dec, iters = d["ref"].decode(llr)
                it_sum += float(iters)
                errs = (dec != bits).float().sum(dim=1)
                rb += int(errs.sum()); rf += int((errs > 0).sum())
                per_frame[snr].extend(errs.tolist())
                ours = np.asarray(d["ours"](jnp.asarray(llr.numpy())))
                oerrs = (ours != 0).sum(axis=1)
                ob += int(oerrs.sum()); of += int((oerrs > 0).sum())
                mismatch_bits += int((ours != dec.numpy()).sum())
                mismatch_frames += int(((ours != dec.numpy()).sum(axis=1) > 0).sum())
            ref_bit.append(rb / (frames * n)); ref_frame.append(rf / frames)
            our_bit.append(ob / (frames * n)); our_frame.append(of / frames)
            ref_iters.append(it_sum / args.trials)
            print(f"[{time.strftime('%H:%M:%S')}] {name} snr {snr:+.1f}: "
                  f"ref BER {ref_bit[-1]:.3e} FER {ref_frame[-1]:.3e} "
                  f"iters {ref_iters[-1]:.1f} | ours BER {our_bit[-1]:.3e} "
                  f"| mismatched bits so far {mismatch_bits}", flush=True)
        out["decoders"][name] = {
            "ber": ref_bit,
            "fer": ref_frame,
            "avg_iterations": ref_iters,
            "fer_ci95": [wilson_ci(int(f * frames), frames) for f in ref_frame],
            "ber_ci95": [cluster_ci(per_frame[s], n) for s in snrs],
            "ours_ber": our_bit,
            "ours_fer": our_frame,
            "mismatch_bits": mismatch_bits,
            "mismatch_frames": mismatch_frames,
            "total_frames": frames * len(snrs),
            "total_bits": frames * len(snrs) * n,
        }

    out["wall_seconds"] = round(time.time() - t_start, 1)
    dest = Path(args.out or f"results/reference_torch_{args.code.lower()}.json")
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_text(json.dumps(out, indent=2))
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
