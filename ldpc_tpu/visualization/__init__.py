"""Plotting / reporting layer."""

from ldpc_tpu.visualization.plots import (  # noqa: F401
    apply_paper_style,
    plot_combined,
    plot_iterations,
    plot_metric,
    plot_parameter_counts,
    plot_training_history,
    render_report,
)
