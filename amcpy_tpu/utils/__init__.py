from amcpy_tpu.utils.metrics import MetricsLogger, stage_timer, trace_region

__all__ = ["MetricsLogger", "stage_timer", "trace_region"]
