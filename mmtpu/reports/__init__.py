from mmtpu.reports.report import (
    EmbeddingVisualizationReport,
    ExperimentReportGenerator,
    LatexReport,
    MetricsReport,
    ModelReport,
    TimingReport,
)

__all__ = [
    "ExperimentReportGenerator",
    "LatexReport",
    "MetricsReport",
    "ModelReport",
    "TimingReport",
    "EmbeddingVisualizationReport",
]
