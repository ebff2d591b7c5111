"""Dataset: a schema-carrying table abstraction over parquet / in-memory data.

Plays the role of ``merlin.io.Dataset`` in the reference (Dask/cuDF-backed there).
On the TPU stack data prep happens on the host CPU: pyarrow for parquet IO, numpy
for batch assembly. Multi-file datasets iterate partition-by-partition so the item
catalog / training data never has to fit in one arrow table at once.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Optional, Sequence, Union

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import Schema

SCHEMA_FILE = "schema.json"


def _list_parquet_files(path: str) -> List[str]:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"No parquet files under {path}")
        return files
    return [path]


class Dataset:
    """A (possibly multi-file) table + its :class:`Schema`."""

    def __init__(
        self,
        data: Union[pa.Table, Dict[str, np.ndarray], str, List[str], "Dataset"],
        schema: Optional[Schema] = None,
    ):
        self._files: Optional[List[str]] = None
        self._table: Optional[pa.Table] = None

        if isinstance(data, Dataset):
            self._files, self._table, schema = data._files, data._table, schema or data.schema
        elif isinstance(data, pa.Table):
            self._table = data
        elif isinstance(data, dict):
            self._table = _dict_to_table(data)
        elif isinstance(data, str):
            self._files = _list_parquet_files(data)
            if schema is None:
                base = data if os.path.isdir(data) else os.path.dirname(data)
                json_sidecar = os.path.join(base, SCHEMA_FILE)
                pbtxt_sidecar = os.path.join(base, "schema.pbtxt")
                if os.path.exists(json_sidecar):
                    schema = Schema.load(json_sidecar)
                elif os.path.exists(pbtxt_sidecar):
                    schema = Schema.load_pbtxt(pbtxt_sidecar)
        elif isinstance(data, (list, tuple)):
            self._files = list(data)
        else:
            raise TypeError(f"Cannot build Dataset from {type(data)}")

        if schema is None:
            schema = _infer_schema(self._peek_arrow_schema())
        self.schema = schema

    # ---- basic info --------------------------------------------------------
    def _peek_arrow_schema(self) -> pa.Schema:
        if self._table is not None:
            return self._table.schema
        return pq.read_schema(self._files[0])

    @property
    def num_rows(self) -> int:
        if self._table is not None:
            return self._table.num_rows
        return sum(pq.ParquetFile(f).metadata.num_rows for f in self._files)

    @property
    def column_names(self) -> List[str]:
        return self._peek_arrow_schema().names

    def __len__(self) -> int:
        return self.num_rows

    # ---- materialization ---------------------------------------------------
    def to_table(self) -> pa.Table:
        if self._table is not None:
            return self._table
        return pa.concat_tables([pq.read_table(f) for f in self._files])

    def to_numpy_dict(self) -> Dict[str, np.ndarray]:
        """Materialize every column to numpy. List columns come back as object
        arrays of per-row numpy arrays (use the Loader for padded batches)."""
        return table_to_numpy(self.to_table())

    def partitions(self) -> Iterator[pa.Table]:
        if self._table is not None:
            yield self._table
        else:
            for f in self._files:
                yield pq.read_table(f)

    # ---- transforms --------------------------------------------------------
    def head(self, n: int = 5) -> pa.Table:
        return self.to_table().slice(0, n)

    def take(self, n: int) -> "Dataset":
        return Dataset(self.to_table().slice(0, n), schema=self.schema)

    def shuffle(self, seed: int = 0) -> "Dataset":
        table = self.to_table()
        rng = np.random.default_rng(seed)
        idx = rng.permutation(table.num_rows)
        return Dataset(table.take(pa.array(idx)), schema=self.schema)

    def select_columns(self, names: Sequence[str]) -> "Dataset":
        table = self.to_table().select(list(names))
        return Dataset(table, schema=self.schema.select_by_name(names))

    def split(self, fractions: Sequence[float], seed: int = 0) -> List["Dataset"]:
        table = self.to_table()
        n = table.num_rows
        rng = np.random.default_rng(seed)
        idx = rng.permutation(n)
        out, start = [], 0
        for frac in fractions:
            count = int(round(frac * n))
            part = idx[start : start + count]
            out.append(Dataset(table.take(pa.array(part)), schema=self.schema))
            start += count
        return out

    def unique_by(self, column: str) -> "Dataset":
        """Deduplicate rows by a column, keeping the first occurrence.

        Reference: ``unique_rows_by_features`` (``models/utils/dataset.py:85``) —
        used to build the item/user catalog for index construction.
        """
        table = self.to_table()
        col = table.column(column).to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(col, return_index=True)
        order = np.sort(first_idx)
        return Dataset(table.take(pa.array(order)), schema=self.schema)

    # ---- IO ----------------------------------------------------------------
    def to_parquet(
        self, path: str, row_group_size: Optional[int] = None, num_partitions: int = 1
    ) -> str:
        os.makedirs(path, exist_ok=True)
        table = self.to_table()
        n = table.num_rows
        per = -(-n // max(num_partitions, 1))
        for i in range(max(num_partitions, 1)):
            part = table.slice(i * per, per)
            if part.num_rows == 0:
                break
            pq.write_table(
                part, os.path.join(path, f"part_{i}.parquet"), row_group_size=row_group_size
            )
        self.schema.save(os.path.join(path, SCHEMA_FILE))
        return path

    @classmethod
    def from_parquet(cls, path: str, schema: Optional[Schema] = None) -> "Dataset":
        return cls(path, schema=schema)

    def __repr__(self):
        src = f"{len(self._files)} files" if self._files else "in-memory"
        return f"Dataset({src}, rows={self.num_rows}, cols={len(self.schema)})"


# ---------------------------------------------------------------------------


def _dict_to_table(data: Dict[str, np.ndarray]) -> pa.Table:
    arrays, names = [], []
    # ragged list columns may arrive in the loader's own (values, offsets)
    # encoding: "<name>__values" + "<name>__offsets" → one arrow list column
    pair_bases = {
        n[: -len("__values")]
        for n in data
        if n.endswith("__values") and n[: -len("__values")] + "__offsets" in data
    }
    for base in sorted(pair_bases):
        names.append(base)
        offsets = np.asarray(data[base + "__offsets"], np.int32)
        values = pa.array(np.asarray(data[base + "__values"]))
        arrays.append(pa.ListArray.from_arrays(pa.array(offsets), values))
    for name, col in data.items():
        if name.endswith("__values") or name.endswith("__offsets"):
            if name.rsplit("__", 1)[0] in pair_bases:
                continue
        names.append(name)
        if isinstance(col, np.ndarray) and col.ndim == 2:
            # fixed-length lists stored as 2-D arrays
            arrays.append(pa.array(list(col)))
        elif (
            isinstance(col, (list, np.ndarray))
            and len(col)
            and isinstance(_first(col), (list, np.ndarray))
        ):
            arrays.append(pa.array([np.asarray(row).tolist() for row in col]))
        else:
            arrays.append(pa.array(np.asarray(col)))
    return pa.table(dict(zip(names, arrays)))


def _first(col):
    return col[0]


def _hash_if_strings(arr: np.ndarray) -> np.ndarray:
    """String/bytes columns hash to deterministic non-negative int32 ids —
    raw-string id spaces feed embedding tables (DynamicEmbeddingTable) without
    a vocabulary pass, the reference's ``safe_embedding_lookup_sparse`` use
    case (``tf/inputs/embedding.py:439``). Non-string columns pass through."""
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        from ..inputs.dynamic import string_id_hash

        return string_id_hash(arr)
    return arr


def table_to_numpy(table: pa.Table) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for name in table.column_names:
        col = table.column(name)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            combined = col.combine_chunks()
            if isinstance(combined, pa.ChunkedArray):
                combined = combined.chunk(0)
            values = combined.values.to_numpy(zero_copy_only=False)
            offsets = combined.offsets.to_numpy(zero_copy_only=False)
            out[name + "__values"] = _hash_if_strings(values)
            out[name + "__offsets"] = offsets.astype(np.int64)
        else:
            out[name] = _hash_if_strings(col.to_numpy(zero_copy_only=False))
    return out


def _infer_schema(arrow_schema: pa.Schema) -> Schema:
    from ..schema import ColumnSchema

    cols = []
    for f in arrow_schema:
        is_list = pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
        vtype = f.type.value_type if is_list else f.type
        if pa.types.is_integer(vtype):
            dtype = "int64" if vtype.bit_width == 64 else "int32"
        elif pa.types.is_floating(vtype):
            dtype = "float32"
        else:
            dtype = "bytes"
        cols.append(ColumnSchema(f.name, dtype=dtype, is_list=is_list, is_ragged=is_list))
    return Schema(cols)
