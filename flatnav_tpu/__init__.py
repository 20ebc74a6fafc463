"""flatnav-tpu: TPU-native flat navigable-small-world ANN search.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of FlatNav
(github.com/BlaiseMuhirwa/flatnav, reference snapshot at /root/reference):
a hierarchy-free HNSW-style graph index with batched, jit-compiled beam
search and wave-based on-device construction.

Public surface mirrors the reference's Python package
(python-bindings/src/flatnav/__init__.py): `flatnav_tpu.index` and
`flatnav_tpu.data_type` submodules.
"""

from flatnav_tpu import data_type  # noqa: F401
from flatnav_tpu import index  # noqa: F401
from flatnav_tpu.data_type import DataType  # noqa: F401
from flatnav_tpu.ops.distances import MetricType  # noqa: F401

__version__ = "0.1.0"
