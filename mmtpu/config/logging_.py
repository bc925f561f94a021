"""Output path templating + directory creation.

Reference: config/logging_config.py:40-192 — `$ENV` expansion, partial
`{experiment_name}/{run_id}/{timestamp}` interpolation, directory creation,
`save_metric` checkpoint criterion, `tb_record_only` TensorBoard regex
allowlist.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, List, Optional

from mmtpu.config.base import BaseConfig
from mmtpu.utils.utils import SafeDict, format_path_with_env


@dataclass
class LoggingConfig(BaseConfig):
    log_path: str
    model_output_path: str
    metrics_path: str
    save_metric: str = "loss"
    monitor_path: Optional[str] = None
    tensorboard_path: Optional[str] = None
    tb_record_only: Optional[List[str]] = None
    experiment_name: str = ""
    run_id: int = 1
    timestamp: str = field(
        default_factory=lambda: datetime.now().strftime("%Y%m%d_%H%M%S")
    )

    _PATH_FIELDS = (
        "log_path",
        "model_output_path",
        "metrics_path",
        "monitor_path",
        "tensorboard_path",
    )

    @classmethod
    def from_dict(
        cls, data: Dict[str, Any], experiment_name: str = "", run_id: int = 1, **extra
    ) -> "LoggingConfig":
        cfg = super().from_dict(
            data, experiment_name=experiment_name, run_id=run_id, **extra
        )
        cfg._process_paths()
        return cfg

    def format_path(self, path: str) -> str:
        """Expand $ENV vars and {experiment_name}/{run_id}/{timestamp}."""
        import re

        expanded = format_path_with_env(str(path))
        # reference sanitization (logging_config.py:79-81): spaces, hyphens
        # AND other specials collapse to underscores ("MM_IMDb C-MAM ..." ->
        # "MM_IMDb_C_MAM_..."), so output dirs match byte-for-byte
        safe_name = re.sub(
            r"[^\w\s-]|[\s-]+", "_", self.experiment_name
        ).strip("_")
        return expanded.format_map(
            SafeDict(
                experiment_name=safe_name,
                run_id=self.run_id,
                timestamp=self.timestamp,
            )
        )

    def _process_paths(self) -> None:
        for name in self._PATH_FIELDS:
            value = getattr(self, name, None)
            if value:
                setattr(self, name, self.format_path(value))

    def create_directories(self) -> None:
        for name in self._PATH_FIELDS:
            value = getattr(self, name, None)
            if value:
                Path(value).mkdir(parents=True, exist_ok=True)
