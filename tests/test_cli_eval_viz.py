"""CLI, comparative evaluator, and visualization tests (small configs, CPU)."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.cli import main as cli_main
from ldpc_tpu.codes import get_base_graph, qc_layout
from ldpc_tpu.config import Config
from ldpc_tpu.models import make_standard_decoder
from ldpc_tpu.ops import qc_msg
from ldpc_tpu.training.evaluator import ComparativeEvaluator
from ldpc_tpu.visualization.plots import plot_combined, render_report


@pytest.fixture(scope="module")
def plan():
    return qc_msg.make_plan(qc_layout(get_base_graph("toy_4x8"), 4))


class TestConfig:
    def test_snr_ranges(self):
        cfg = Config(snr_min=-2, snr_max=6, snr_step=2, eval_snr_step=1)
        assert cfg.train_snr_range() == [-2, 0, 2, 4, 6]
        assert len(cfg.eval_snr_range()) == 9

    def test_json_roundtrip(self, tmp_path):
        cfg = Config(num_epochs=7, base_graph="toy_4x8")
        p = tmp_path / "cfg.json"
        p.write_text(cfg.to_json())
        assert Config.from_file(p) == cfg


class TestEvaluator:
    def test_evaluate_all_and_summary(self, plan, capsys):
        ev = ComparativeEvaluator(plan, snr_range=[2.0, 6.0], batch_size=16, num_trials=2)
        ev.add_belief_propagation(10)
        ev.add_min_sum(10, 0.75)
        model = make_standard_decoder(num_iterations=3)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, plan.C * plan.Z)), plan)
        ev.add_model("Neural", model, params)
        res = ev.evaluate_all(log=None)
        assert set(res["decoders"]) == {"Belief Propagation", "Min-Sum Scaled", "Neural"}
        for entry in res["decoders"].values():
            assert len(entry["ber"]) == 2
        assert "avg_iterations" in res["decoders"]["Min-Sum Scaled"]
        assert res["decoders"]["Neural"]["param_count"] > 0
        ev.print_summary()
        out = capsys.readouterr().out
        assert "BER" in out and "parameters" in out

    def test_save_load(self, plan, tmp_path):
        ev = ComparativeEvaluator(plan, snr_range=[4.0], batch_size=8, num_trials=1)
        ev.add_min_sum(5)
        ev.evaluate_all(log=None)
        p = tmp_path / "res.json"
        ev.save_results(p)
        ev2 = ComparativeEvaluator(plan)
        loaded = ev2.load_results(p)
        assert loaded == ev.results


class TestVisualization:
    def _results(self):
        return {
            "snr_range": [0.0, 2.0, 4.0],
            "decoders": {
                "BP": {"ber": [0.1, 0.01, 0.0], "fer": [0.5, 0.1, 0.0],
                       "avg_iterations": [9, 4, 2], "param_count": 0},
                "Neural": {"ber": [0.08, 0.008, 1e-4], "fer": [0.4, 0.08, 0.001],
                           "param_count": 1234},
            },
        }

    def test_combined_figure(self):
        fig = plot_combined(self._results())
        assert len(fig.axes) == 4

    def test_render_report(self, tmp_path):
        p = tmp_path / "results.json"
        p.write_text(json.dumps(self._results()))
        written = render_report(p, tmp_path / "out", paper_style=True)
        assert len(written) == 4
        assert all(w.exists() and w.stat().st_size > 1000 for w in written)


class TestCLI:
    def test_workflow_end_to_end(self, tmp_path, capsys):
        """Full train->evaluate->compare->visualize chain on a tiny config."""
        cli_main([
            "workflow",
            "--base-graph", "toy_4x8",
            "--lifting-factor", "4",
            "--model-type", "tied",
            "--num-epochs", "2",
            "--batch-size", "8",
            "--num-trials", "2",
            "--snr-min", "0", "--snr-max", "4", "--snr-step", "2",
            "--eval-snr-step", "2",
            "--bp-max-iterations", "5",
            "--model-path", str(tmp_path / "m.msgpack"),
            "--results-dir", str(tmp_path / "results"),
        ])
        out = capsys.readouterr().out
        assert (tmp_path / "m.msgpack").exists()
        assert (tmp_path / "results" / "comparison_results.json").exists()
        assert (tmp_path / "results" / "combined_comparison.png").exists()
        assert "done in" in out

    def test_unknown_model_type(self, tmp_path):
        with pytest.raises(SystemExit):
            cli_main(["train", "--model-type", "nope", "--base-graph", "toy_4x8",
                      "--lifting-factor", "4", "--num-epochs", "1"])


class TestMultiModelCompare:
    def test_compare_models_flag(self, tmp_path, capsys):
        cli_main([
            "compare",
            "--base-graph", "toy_4x8", "--lifting-factor", "4",
            "--compare-models", "standard,tied,message_gnn",
            "--num-trials", "1", "--batch-size", "8",
            "--snr-min", "2", "--snr-max", "4", "--eval-snr-step", "2",
            "--bp-max-iterations", "5", "--random-codewords",
            "--results-dir", str(tmp_path),
        ])
        out = capsys.readouterr().out
        assert "fresh standard model" in out
        import json
        res = json.loads((tmp_path / "comparison_results.json").read_text())
        assert len(res["decoders"]) == 5  # BP + MS + 3 neural


class TestBoolFlagOverrides:
    def test_no_flag_overrides_config_file_on(self, tmp_path, capsys):
        """A config-file `true` bool must be overridable off from the CLI."""
        cfg = tmp_path / "cfg.json"
        cfg.write_text(Config(compare_with_traditional=True).to_json())
        cli_main([
            "compare", "--config", str(cfg),
            "--base-graph", "toy_4x8", "--lifting-factor", "4",
            "--model-type", "tied", "--no-compare-with-traditional",
            "--num-trials", "1", "--batch-size", "8",
            "--snr-min", "4", "--snr-max", "4",
            "--results-dir", str(tmp_path),
        ])
        res = json.loads((tmp_path / "comparison_results.json").read_text())
        assert set(res["decoders"]) == {"Neural (tied)"}  # no BP / min-sum rows

    def test_paper_style_no_flag_parses(self):
        from ldpc_tpu.cli import build_parser

        args = build_parser().parse_args(["visualize", "--no-paper-style"])
        assert args.paper_style is False


def test_evaluate_reports_param_count(tmp_path):
    cli_main([
        "evaluate", "--base-graph", "toy_4x8", "--lifting-factor", "4",
        "--model-type", "tied", "--num-trials", "1", "--batch-size", "8",
        "--snr-min", "4", "--snr-max", "4",
        "--model-path", str(tmp_path / "none.msgpack"),
        "--results-dir", str(tmp_path),
    ])
    res = json.loads((tmp_path / "evaluation_results.json").read_text())
    assert res["decoders"]["tied"]["param_count"] > 0


def test_notebook_converter(tmp_path):
    import sys
    sys.path.insert(0, "tools")
    from convert_notebook import create_directory_structure, extract_code_cells
    import json as _json

    nb = {"cells": [
        {"cell_type": "markdown", "source": ["# hi"]},
        {"cell_type": "code", "source": ["x = 1\n", "print(x)"]},
        {"cell_type": "code", "source": ["y = 2"]},
    ]}
    p = tmp_path / "nb.ipynb"
    p.write_text(_json.dumps(nb))
    cells = extract_code_cells(p)
    assert len(cells) == 2 and "x = 1" in cells[0]
    written = create_directory_structure(tmp_path / "out", cells)
    assert len(written) == 2
    assert (tmp_path / "out" / "__init__.py").exists()


def test_evaluate_with_random_codewords(tmp_path, capsys):
    cli_main([
        "evaluate", "--base-graph", "toy_4x8", "--lifting-factor", "4",
        "--model-type", "tied", "--num-trials", "2", "--batch-size", "8",
        "--snr-min", "2", "--snr-max", "6", "--eval-snr-step", "2",
        "--random-codewords",
        "--model-path", str(tmp_path / "none.msgpack"),
        "--results-dir", str(tmp_path),
    ])
    out = capsys.readouterr().out
    assert "BER" in out
    assert (tmp_path / "evaluation_results.json").exists()
