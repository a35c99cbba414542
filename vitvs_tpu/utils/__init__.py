from vitvs_tpu.utils.profiling import StageTimer, trace_to

__all__ = ["StageTimer", "trace_to"]
