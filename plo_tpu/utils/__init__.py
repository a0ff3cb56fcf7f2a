"""Profiling, evaluation, and artifact-saving utilities."""
from plo_tpu.utils.profiling import TicToc, MetricsLog, DeviceTrace  # noqa: F401
from plo_tpu.utils.evaluate import ate_rmse, rpe, align_umeyama  # noqa: F401
