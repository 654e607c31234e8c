from evreal_tpu.metrics.functional import mse, ssim
from evreal_tpu.metrics.tracker import EvalMetricsTracker, MetricTracker
