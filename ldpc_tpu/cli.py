"""Command-line interface: train / evaluate / compare / visualize / workflow.

Mode and flag parity with the reference CLI (``main.py:11-60`` argparse,
mode dispatch ``main.py:324-337``) plus the workflow chaining of
``run_workflow.py:91-151`` — run in-process rather than via subprocess
(the reference shells out per stage and crashes on a torch-before-import
bug, run_workflow.py:24).  Every flag maps onto :class:`ldpc_tpu.config.Config`.
"""
from __future__ import annotations

import argparse
import dataclasses
import time
from pathlib import Path

from ldpc_tpu.config import Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ldpc-tpu", description="TPU-native 5G LDPC decoding framework")
    p.add_argument("mode", choices=["train", "evaluate", "compare", "visualize", "workflow", "bench"])
    p.add_argument("--config", type=str, default=None, help="JSON config file (flags override)")
    defaults = Config()
    for f in dataclasses.fields(Config):
        flag = "--" + f.name.replace("_", "-")
        if f.type == "bool" or isinstance(getattr(defaults, f.name), bool):
            # --flag / --no-flag so a config-file `true` can be overridden off
            p.add_argument(flag, action=argparse.BooleanOptionalAction, default=None)
        else:
            p.add_argument(flag, type=type(getattr(defaults, f.name)), default=None)
    return p


def config_from_args(args) -> Config:
    cfg = Config.from_file(args.config) if args.config else Config()
    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(Config)
        if getattr(args, f.name, None) is not None
    }
    return cfg.replace(**overrides)


# ---------------------------------------------------------------------------


def _setup(cfg: Config):
    from ldpc_tpu.codes import get_base_graph, load_base_matrix, qc_layout
    from ldpc_tpu.ops import qc_msg

    if Path(cfg.base_graph).exists():
        bg = load_base_matrix(cfg.base_graph)
    else:
        bg = get_base_graph(cfg.base_graph)
    qc = qc_layout(bg, cfg.lifting_factor)
    return bg, qc, qc_msg.make_plan(qc)





def make_model(cfg: Config, plan):
    """Model factory (reference ``create_model`` main.py:62-82, extended to
    the full family)."""
    from ldpc_tpu.models import (
        create_corrected_minsum_gnn_decoder,
        create_custom_check_message_gnn_decoder,
        create_custom_minsum_message_gnn_decoder,
        create_custom_variable_message_gnn_decoder,
        create_message_gnn_decoder,
        make_base_graph_gnn_decoder,
        make_gnn_decoder,
        make_standard_decoder,
        make_tied_decoder,
    )

    mt = cfg.model_type
    if mt == "standard":
        return make_standard_decoder(cfg.num_iterations, cfg.depth_L)
    if mt == "tied":
        return make_tied_decoder(cfg.num_iterations, cfg.depth_L)
    if mt == "gnn":
        return make_gnn_decoder(cfg.num_iterations, cfg.depth_L)
    if mt == "base_graph_gnn":
        return make_base_graph_gnn_decoder(cfg.num_iterations, cfg.depth_L)
    gnn_kw = dict(num_iterations=cfg.num_iterations, hidden_dim=cfg.hidden_dim,
                  share_layers=cfg.share_layers)
    if mt == "message_gnn":
        return create_message_gnn_decoder(plan, **gnn_kw)
    if mt == "message_gnn_var_minsum":
        return create_custom_variable_message_gnn_decoder(plan, depth_L=cfg.depth_L, **gnn_kw)
    if mt == "message_gnn_check_minsum":
        return create_custom_check_message_gnn_decoder(plan, **gnn_kw)
    if mt == "message_gnn_minsum":
        return create_custom_minsum_message_gnn_decoder(plan, depth=cfg.depth_L,
                                                        num_iterations=cfg.num_iterations,
                                                        hidden_dim=cfg.hidden_dim)
    if mt == "message_gnn_corrected":
        return create_corrected_minsum_gnn_decoder(plan, input_injection=True, **gnn_kw)
    raise SystemExit(f"unknown --model-type {mt!r}")


def _trainer(cfg: Config, plan, bg=None):
    from ldpc_tpu.training import LDPCDecoderTrainer

    encoder = None
    if bg is not None and (cfg.data_mode == "random_codewords" or cfg.random_codewords):
        from ldpc_tpu.codes import encoder_from_H, expand_base_matrix

        encoder = encoder_from_H(expand_base_matrix(bg, cfg.lifting_factor))
    model = make_model(cfg, plan)
    return LDPCDecoderTrainer(model, plan, seed=cfg.seed, convention=cfg.convention,
                              modulation=cfg.modulation, encoder=encoder)


def cmd_train(cfg: Config) -> None:
    bg, _, plan = _setup(cfg)
    tr = _trainer(cfg, plan, bg)
    print(f"training {cfg.model_type} on {cfg.base_graph} Z={cfg.lifting_factor} "
          f"({cfg.num_epochs} epochs, {cfg.data_mode}, {cfg.optimizer})")
    tr.train(
        num_epochs=cfg.num_epochs,
        batch_size=cfg.batch_size,
        learning_rate=cfg.learning_rate,
        snr_range=cfg.train_snr_range(),
        momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        validation_interval=cfg.validation_interval,
        data_mode=cfg.data_mode,
        optimizer=cfg.optimizer,
    )
    tr.save_model(cfg.model_path)
    Path(cfg.results_dir).mkdir(parents=True, exist_ok=True)
    tr.save_history_json(Path(cfg.results_dir) / "training_history.json")
    print(f"saved model to {cfg.model_path}")


def cmd_evaluate(cfg: Config) -> None:
    bg, _, plan = _setup(cfg)
    tr = _trainer(cfg.replace(data_mode="random_codewords") if cfg.random_codewords else cfg,
                  plan, bg)
    if Path(cfg.model_path).exists():
        tr.load_model(cfg.model_path)
        print(f"loaded {cfg.model_path}")
    else:
        print(f"warning: {cfg.model_path} not found — evaluating untrained model")
    snrs = cfg.eval_snr_range()
    bers, fers = tr.evaluate_snr_range(snrs, cfg.batch_size, cfg.num_trials,
                                       use_encoder=cfg.random_codewords)
    import jax

    n_params = sum(int(x.size) for x in jax.tree_util.tree_leaves(tr.params))
    results = {"snr_range": snrs,
               "decoders": {cfg.model_type: {"ber": bers, "fer": fers,
                                             "param_count": n_params}}}
    out = Path(cfg.results_dir) / "evaluation_results.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    import json

    out.write_text(json.dumps(results, indent=2))
    for s, b, f in zip(snrs, bers, fers):
        print(f"snr {s:5.1f}  BER {b:.3e}  FER {f:.3f}")
    print(f"saved {out}")


def cmd_compare(cfg: Config) -> None:
    """Compare classical + neural decoders (the run_comparison.py /
    run_comparison_all.py capability: multiple model types via
    --compare-models, fresh-model fallback when no checkpoint exists,
    parameter counts in the results)."""
    from ldpc_tpu.training.evaluator import ComparativeEvaluator

    bg, qc, plan = _setup(cfg)
    mesh = None
    if cfg.mesh_data:
        from ldpc_tpu.parallel import make_mesh

        mesh = make_mesh(data=cfg.mesh_data, model=cfg.mesh_model)
    encoder = None
    if cfg.random_codewords:
        from ldpc_tpu.codes import encoder_from_H, expand_base_matrix

        encoder = encoder_from_H(expand_base_matrix(bg, cfg.lifting_factor))
    ev = ComparativeEvaluator(
        plan,
        snr_range=cfg.eval_snr_range(),
        batch_size=cfg.batch_size,
        num_trials=cfg.num_trials,
        mesh=mesh,
        modulation=cfg.modulation,
        convention=cfg.convention,
        encoder=encoder,
    )
    if cfg.compare_with_traditional:
        ev.add_belief_propagation(cfg.bp_max_iterations)
        ev.add_min_sum(cfg.bp_max_iterations, cfg.ms_scaling_factor)
    model_types = [m for m in cfg.compare_models.split(",") if m] or [cfg.model_type]
    for mt in model_types:
        sub = cfg.replace(model_type=mt)
        tr = _trainer(sub, plan)
        path = Path(cfg.model_path)
        mt_path = path if len(model_types) == 1 else path.with_name(f"{mt}_{path.name}")
        if mt_path.exists():
            tr.load_model(mt_path)
            print(f"loaded {mt} model from {mt_path}")
        else:
            # fresh-model fallback, as run_comparison_all.py:88-143
            print(f"no checkpoint at {mt_path} — using fresh {mt} model")
        ev.add_model(f"Neural ({mt})", tr.model, tr.params)
    ev.evaluate_all()
    ev.print_summary()
    out = Path(cfg.results_dir) / "comparison_results.json"
    ev.save_results(out)
    print(f"saved {out}")


def cmd_visualize(cfg: Config) -> None:
    from ldpc_tpu.visualization.plots import render_report

    results = Path(cfg.results_dir) / "comparison_results.json"
    if not results.exists():
        results = Path(cfg.results_dir) / "evaluation_results.json"
    if not results.exists():
        raise SystemExit(f"no results found under {cfg.results_dir} — run compare/evaluate first")
    written = render_report(results, cfg.results_dir, paper_style=cfg.paper_style)
    for p in written:
        print(f"wrote {p}")


def cmd_workflow(cfg: Config) -> None:
    """train -> evaluate -> compare -> visualize with per-stage timing
    (run_workflow.py:91-151, minus the subprocess boundary)."""
    for stage in (cmd_train, cmd_evaluate, cmd_compare, cmd_visualize):
        t0 = time.time()
        print(f"=== {stage.__name__[4:]} ===")
        stage(cfg)
        print(f"=== {stage.__name__[4:]} done in {time.time() - t0:.1f}s ===")


def cmd_bench(cfg: Config) -> None:
    import bench

    bench.main()


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    dispatch = {
        "train": cmd_train,
        "evaluate": cmd_evaluate,
        "compare": cmd_compare,
        "visualize": cmd_visualize,
        "workflow": cmd_workflow,
        "bench": cmd_bench,
    }
    dispatch[args.mode](cfg)


if __name__ == "__main__":
    main()
