from flatnav_tpu.ops.distances import (  # noqa: F401
    MetricType,
    brute_force_knn,
    fast_knn,
    pairwise_distances,
    query_block_distances,
    squared_norms,
)
from flatnav_tpu.ops.fused_scan import fused_knn  # noqa: F401
