"""Typed configs, metrics (ATE/RPE), timers."""

from pslam_tpu.utils.config import SlamConfig, Capacities  # noqa: F401
from pslam_tpu.utils.metrics import ate_rmse, align_se3  # noqa: F401
