"""Data type system for flatnav_tpu.

TPU-native re-design of the reference's dtype registry
(/root/reference/include/flatnav/util/Datatype.h:11-137): instead of a C++
enum + template metaprogram that stamps out one Index specialization per
dtype, we keep a small enum that maps onto JAX dtypes. Only float32, uint8
and int8 are "wired up" in the reference (Datatype.h comment + bindings), and
the same three are first-class here; float16/bfloat16 are additionally
supported because they are natively fast on TPU.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class DataType(enum.Enum):
    """Mirrors flatnav.data_type.DataType (reference bindings.cpp:523-527)."""

    uint8 = "uint8"
    int8 = "int8"
    float16 = "float16"
    bfloat16 = "bfloat16"
    float32 = "float32"

    @property
    def jax_dtype(self):
        return jnp.dtype(self.value)

    @property
    def numpy_dtype(self):
        if self.value == "bfloat16":
            return jnp.dtype("bfloat16")
        return np.dtype(self.value)

    @property
    def size_bytes(self) -> int:
        """Per-element size (reference Datatype.h:75-119 `size()`)."""
        return jnp.dtype(self.value).itemsize


def from_dtype(dtype) -> DataType:
    """Map a numpy/JAX dtype to a DataType enum member."""
    name = jnp.dtype(dtype).name
    try:
        return DataType(name)
    except ValueError as e:
        raise ValueError(
            f"Unsupported index data type {name!r}; supported: "
            f"{[d.value for d in DataType]}"
        ) from e
