"""Arrow-native embedding payload helpers.

Embeddings ride every shuffle and scoring loop as Arrow
``list<float32>`` / ``fixed_size_list<float32>`` columns; these helpers
are the only two conversions anything needs:

- ``vec_matrix(col)``: Arrow (fixed-size-)list column -> ``(N, dim)``
  float64 ndarray in ONE C pass (zero-copy float32 buffer view, then a
  single vectorized cast). Replaces the per-row
  ``list(map(float, row))`` loops — the pickled-object-payload pattern
  whose elimination on the MinHash path measured 157 s -> 17.6 s (see
  ``dedup._sig_matrix``, the uint64 template this generalizes).
- ``fixed_list_f32(mat)``: ``(N, dim)`` ndarray ->
  ``pa.FixedSizeListArray`` of float32 — the compact fixed-width shuffle
  carrier. Source embeddings are float32 parquet, so float64->float32
  re-encoding of values that started as float32 is lossless and the
  float64 scores computed downstream are bit-identical to scoring the
  original column.

Scoring stays float64 (one cast per batch) so results remain
bit-identical to the DuckDB oracles, which compute in double.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow list-like column -> (N, dim) ndarray, one vectorized cast.

    Accepts ``fixed_size_list`` (flatten() respects slice offsets) and
    plain ``list`` (uniform row width required — raises otherwise, never
    mis-shapes silently).
    """
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if isinstance(arr.type, pa.ExtensionType):
        # Ray's ArrowTensorType (what from_pandas/from_items produce for
        # ndarray cells): to_numpy yields the (N, dim) block directly
        out = arr.to_numpy(zero_copy_only=False)
        if out.dtype == object:
            out = np.stack(out)
        return np.ascontiguousarray(out).astype(dtype, copy=False)
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        flat = arr.flatten()
    else:
        flat = pc.list_flatten(arr)
        dim = len(flat) // n if n else 0
        if n:
            # explicit per-row width check: a ragged column whose TOTAL
            # happens to be divisible by n would otherwise mis-shape
            # silently (e.g. rows of 3 and 1 values -> 2x2 garbage)
            mm = pc.min_max(pc.list_value_length(arr))
            if mm["min"].as_py() != mm["max"].as_py():
                raise ValueError(
                    f"ragged list column: row widths span "
                    f"[{mm['min']}, {mm['max']}]")
    if n == 0:
        return np.empty((0, dim), dtype=dtype)
    out = flat.to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(out).astype(dtype, copy=False).reshape(n, dim)


def fixed_list_f32(mat: np.ndarray) -> pa.FixedSizeListArray:
    """(N, dim) ndarray -> Arrow fixed_size_list<float32, dim> array."""
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    if mat.ndim != 2:
        raise ValueError(f"expected (N, dim) matrix, got shape {mat.shape}")
    return pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), type=pa.float32()), mat.shape[1]
    )


def float_value_type(col) -> "pa.DataType":
    """The float value type of an embedding column: float32 for float32
    (or smaller) sources, float64 for double sources / Ray tensor blocks
    of float64. Decides the shuffle-carrier width so float64-sourced
    embeddings are NEVER silently narrowed (near-threshold cosine checks
    would flip vs an oracle computing on the source values)."""
    t = col.type
    if isinstance(t, pa.ExtensionType):
        vt = getattr(t, "scalar_type", None) or getattr(t, "storage_type", t)
        t = vt
    while pa.types.is_list(t) or pa.types.is_fixed_size_list(t) \
            or pa.types.is_large_list(t):
        t = t.value_type
    return pa.float64() if t == pa.float64() else pa.float32()


def fixed_list_carrier(mat: np.ndarray, value_type) -> pa.FixedSizeListArray:
    """(N, dim) ndarray -> fixed_size_list<value_type, dim> — the
    width-preserving shuffle carrier (see float_value_type)."""
    np_t = np.float64 if value_type == pa.float64() else np.float32
    mat = np.ascontiguousarray(mat, dtype=np_t)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), type=value_type), mat.shape[1]
    )


def fixed_list_i8(mat: np.ndarray) -> pa.FixedSizeListArray:
    """(N, dim) int8 ndarray -> Arrow fixed_size_list<int8, dim> array."""
    mat = np.ascontiguousarray(mat, dtype=np.int8)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), type=pa.int8()), mat.shape[1]
    )


def stack_rows(rows, dtype=np.float64) -> np.ndarray:
    """Driver-side fallback for small row collections (take_all results,
    pandas object cells): one np.asarray per row, no per-element float().
    """
    rows = list(rows)
    if not rows:
        return np.empty((0, 0), dtype=dtype)
    return np.stack([np.asarray(r, dtype=dtype) for r in rows])
