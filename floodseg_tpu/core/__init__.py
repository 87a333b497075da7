from floodseg_tpu.core.profiler import PhaseProfiler

__all__ = ["PhaseProfiler"]
