"""Partition-wise grouping: the scale-safe alternative to
``groupby(key).map_groups(fn)``.

Ray's ``map_groups`` invokes the UDF once PER DISTINCT KEY — at 10^8
keys that is 10^8 Python calls and block slices, which dominates wall
time long before the actual compute does.  ``hash_partitioned`` instead
buckets the key space into ``num_partitions`` hash partitions (the same
co-location guarantee: every row of a key lands in exactly one call) and
hands the UDF a whole partition block; the UDF groups internally with
vectorized factorize/unique, so call count is O(P), independent of key
cardinality.  This mirrors the engine core's merge-apply design
(deltaray/pipeline.py task exchange → one merge call per partition).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from deltaray.transforms import stable_hash_strings


def _hash_cols(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Stable uint64 hash of one or more key columns (vectorized)."""
    h = np.zeros(batch.num_rows, dtype=np.uint64)
    for c in cols:
        col = batch[c]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            v = stable_hash_strings(col)
        else:
            v = col.to_numpy(zero_copy_only=False).astype(np.uint64,
                                                          copy=False)
        # FNV-style mix so (a, b) != (b, a)
        h = (h ^ v) * np.uint64(0x100000001B3)
    return h


def group_codes(tbl: pa.Table, cols: list[str]) -> np.ndarray:
    """First-appearance group codes for a (multi-)column key, vectorized.

    Single column → plain pandas factorize; multiple → factorize each and
    mix into one int64 code space.
    """
    codes = None
    for c in cols:
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ci, uniq = pd.factorize(col.to_numpy(zero_copy_only=False))
        ci = ci.astype(np.int64)
        codes = ci if codes is None else codes * np.int64(len(uniq)) + ci
    if len(cols) > 1:  # re-densify the mixed code space
        codes = pd.factorize(codes)[0].astype(np.int64)
    return codes


def hash_partitioned(ds, key_cols: list[str], fn, *, num_partitions: int = 64):
    """Apply ``fn(block: pa.Table) -> pa.Table`` to complete hash
    partitions of the key space.  ``fn`` sees every row of every key that
    hashes into its partition (and nothing else) and must group
    internally — use :func:`group_codes`."""

    def tag(batch: pa.Table) -> pa.Table:
        part = (_hash_cols(batch, key_cols) % np.uint64(num_partitions))
        return batch.append_column("__part", pa.array(part.astype(np.int32)))

    def run(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(["__part"]))

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__part").map_groups(run, batch_format="pyarrow")
