from flatnav_tpu.parallel.sharding import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    data_sharded,
    make_mesh,
    replicated,
    row_sharded,
)
from flatnav_tpu.parallel.sharded_search import data_parallel_search  # noqa: F401
from flatnav_tpu.parallel.sharded_graph import sharded_search  # noqa: F401
from flatnav_tpu.parallel.sharded_exact import sharded_exact_search  # noqa: F401
from flatnav_tpu.parallel.sharded_pq import sharded_pq_scan  # noqa: F401
