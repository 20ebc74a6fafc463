from flatnav_tpu.bench.data_loader import get_data_loader  # noqa: F401
from flatnav_tpu.bench.metrics import MetricContext, metric_manager  # noqa: F401
