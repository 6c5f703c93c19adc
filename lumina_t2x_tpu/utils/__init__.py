"""Utility surface (counterpart of the reference's `utils/` package:
`utils/cli.py`, `utils/group.py`, misc helpers). The implementations live in
`core/` and `cli/`; this package re-exports them under the familiar names."""

from ..cli.entry_point import DefaultGroup, load_settings
from ..core.checkpoint import (
    export_next_dit_weights,
    import_next_dit_weights,
    load_torch_state_dict,
    save_safetensors,
)
from ..core.logging import MetricsWriter, ProfilerSession, Throughput, create_logger
from ..core.loss_plot import compare_runs, read_metrics_jsonl, scrape_log

__all__ = [
    "DefaultGroup", "load_settings",
    "import_next_dit_weights", "export_next_dit_weights", "load_torch_state_dict",
    "save_safetensors",
    "create_logger", "MetricsWriter", "Throughput", "ProfilerSession",
    "scrape_log", "read_metrics_jsonl", "compare_runs",
    "stable_text_seed",
]


def stable_text_seed(text: str) -> int:
    """Deterministic 31-bit seed for a string — python's builtin ``hash`` is
    SALTED per interpreter (PYTHONHASHSEED), so pseudo-feature conditioning
    keyed on it differs between runs of the same command; crc32 is stable
    across processes, platforms, and versions."""
    import zlib

    return zlib.crc32(text.encode("utf-8")) & 0x7FFFFFFF
