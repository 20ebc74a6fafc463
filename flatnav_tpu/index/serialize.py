"""Flat index serialization: save/load of the three dense arrays + metadata.

Replaces the reference's cereal binary archive (Index::saveIndex/loadIndex,
/root/reference/include/flatnav/index/Index.h:134-141, 442-490) with a
single .npz file holding {vectors, links, labels} plus a JSON metadata
blob. The reference serializes the entire arena including unused capacity
(Index.h:139-140); we store only the committed prefix and record the
capacity in metadata, rebuilding the self-loop padding on load — the
reloaded index must produce bit-identical search results
(test_serialization.cpp:64-75 is the contract, mirrored in our tests).
"""

from __future__ import annotations

import json

import numpy as np

from flatnav_tpu.index.graph import GraphArrays, graph_from_numpy
from flatnav_tpu.ops.distances import MetricType

_FORMAT_VERSION = 1


def save_index(path: str, graph: GraphArrays, metric: MetricType, extra: dict | None = None) -> None:
    n = int(graph.num_nodes)
    meta = {
        "format_version": _FORMAT_VERSION,
        "metric": metric.value,
        "dim": graph.dim,
        "max_edges": graph.max_edges,
        "capacity": graph.capacity,
        "num_nodes": n,
        "dtype": str(np.asarray(graph.vectors[:1]).dtype),
    }
    if extra:
        meta.update(extra)
    # npz has no bfloat16: np.savez would silently write ml_dtypes
    # arrays as raw void ('|V2'), which np.load returns un-castable —
    # store the bits as uint16 and view them back on load (meta["dtype"]
    # already records the logical dtype)
    vecs = np.asarray(graph.vectors[:n])
    if vecs.dtype.kind not in "fiu":
        vecs = vecs.view(np.uint16)
    # Write through an open file handle: np.savez(path) appends ".npz" to
    # bare paths, but the reference's saveIndex accepts arbitrary
    # filenames (Index.h:481-490) — the file must land at the literal
    # path the caller gave.
    with open(path, "wb") as f:
        np.savez(
            f,
            vectors=vecs,
            links=np.asarray(graph.links[:n]),
            labels=np.asarray(graph.labels[:n]),
            metadata=np.frombuffer(
                json.dumps(meta).encode("utf-8"), dtype=np.uint8
            ),
        )


def load_index(path: str):
    """Returns (GraphArrays, metric, metadata dict)."""
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(bytes(z["metadata"]).decode("utf-8"))
        if meta.get("format_version", 0) > _FORMAT_VERSION:
            raise ValueError(
                f"Index file {path} has format version "
                f"{meta['format_version']} > supported {_FORMAT_VERSION}"
            )
        vecs = z["vectors"]
        if meta.get("dtype") == "bfloat16" and vecs.dtype == np.uint16:
            import ml_dtypes

            vecs = vecs.view(ml_dtypes.bfloat16)
        graph = graph_from_numpy(
            vecs,
            z["links"],
            z["labels"],
            num_nodes=meta["num_nodes"],
            capacity=meta["capacity"],
        )
    return graph, MetricType(meta["metric"]), meta
