"""Render BER/FER figures for high-precision sweep JSONs.

The high-precision tools (tools/high_precision_flagship.py,
tools/high_precision_curve.py) write paired Monte-Carlo results keyed
``snr`` + ``decoders``; this adapts them to the comparison-results schema
consumed by :mod:`ldpc_tpu.visualization.plots` (capability parity with the
reference's plot module, `visualization/plot_comparison.py:29-217`) and
writes a two-panel BER/FER PNG next to each input.

Run:  python tools/plot_highprecision.py results/*_highprecision.json
      [--paper-style]
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path


def adapt(raw: dict) -> dict:
    """High-precision sweep JSON -> comparison-results schema."""
    if "decoders" in raw:
        decoders = raw["decoders"]
    else:  # tools/high_precision_curve.py single-decoder format
        name = f"Min-Sum ({raw.get('iterations', '?')} iters)"
        decoders = {name: {"ber": raw["ber"], "fer": raw["fer"]}}
    return {"snr_range": raw["snr"], "decoders": decoders}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--paper-style", action="store_true")
    ap.add_argument("--no-theoretical", action="store_true")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ldpc_tpu.visualization.plots import apply_paper_style, plot_metric

    if args.paper_style:
        apply_paper_style()

    for path in args.inputs:
        path = Path(path)
        raw = json.loads(path.read_text())
        results = adapt(raw)
        fig, axes = plt.subplots(1, 2, figsize=(13, 5))
        plot_metric(results, "ber", axes[0], theoretical=not args.no_theoretical)
        plot_metric(results, "fer", axes[1])
        bits = raw.get("bits_per_point")
        title = f"{raw.get('code', path.stem)}"
        if bits:
            title += f" — {bits:.2g} bits/point"
        fig.suptitle(title)
        fig.tight_layout()
        out = path.with_suffix(".png")
        fig.savefig(out, dpi=150)
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
