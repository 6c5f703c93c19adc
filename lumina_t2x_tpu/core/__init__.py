from .checkpoint import (
    AsyncCheckpointSaver,
    export_next_dit_weights,
    find_auto_resume,
    import_next_dit_weights,
    init_from,
    load_checkpoint,
    load_model_args,
    load_torch_state_dict,
    save_checkpoint,
    save_safetensors,
)
from .logging import (MetricsWriter, ProfilerSession, Throughput, create_logger,
                      enable_compile_cache)

__all__ = [
    "save_checkpoint", "AsyncCheckpointSaver", "load_checkpoint",
    "find_auto_resume", "init_from",
    "load_model_args", "load_torch_state_dict", "save_safetensors",
    "import_next_dit_weights", "export_next_dit_weights",
    "create_logger", "MetricsWriter", "Throughput", "ProfilerSession",
    "enable_compile_cache",
]
