from flatnav_tpu.quantization.kmeans import kmeans  # noqa: F401
from flatnav_tpu.quantization.pq import ProductQuantizer  # noqa: F401
from flatnav_tpu.quantization.pq_index import PQIndex  # noqa: F401
