from mmtpu.analysis.processing import (
    aggregate_runs,
    compare_experiments,
    latex_table,
    load_epoch_metrics,
    load_test_metrics,
    significance_test,
)

__all__ = [
    "aggregate_runs",
    "compare_experiments",
    "latex_table",
    "load_epoch_metrics",
    "load_test_metrics",
    "significance_test",
]
