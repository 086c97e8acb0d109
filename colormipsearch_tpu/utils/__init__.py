from .telemetry import StageTimer, log_memory_usage, processing_context
