from floodseg_tpu.core.platform import honor_jax_platforms_env
from floodseg_tpu.core.profiler import PhaseProfiler

__all__ = ["PhaseProfiler", "honor_jax_platforms_env"]
