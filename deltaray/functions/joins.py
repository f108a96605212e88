"""Distributed join operators the Dataset API lacks natively: as-of join
and broadcast dimension enrichment.

The reference engine has no relational joins (SURVEY.md §2.4) — its only
joins are broadcast-style small-side lookups (table-definition probe per
event, QueueingEventEmitter.java:56-57) and the upsert-as-join delegated
to the target DB.  These operators cover the join shapes a training-data
pipeline needs on top of that:

- ``asof_join``: for every left row, the single right row with the same
  key and the greatest (on, tie) ordering tuple strictly less than (or
  equal to, with ``allow_exact``) the left row's tuple.  Implemented as
  ONE hash-exchange: both sides are normalized to a shared schema,
  unioned, grouped by key, and merged per group with numpy
  ``searchsorted`` — the classic partitioned sort-merge as-of.  The
  partitioning assumption: one key's rows (both sides) fit in a worker;
  for skewed keys pre-filter the right side to the needed time range.
- ``broadcast_enrich``: LEFT-join a large stream against small dimension
  table(s) without any shuffle — the dimension is ``ray.put`` ONCE and
  probed per batch inside an actor pool (the pattern the reference uses
  for its per-event table-definition lookups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_int64(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Normalize an ordering column (timestamp/date/int) to int64."""
    t = col.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        col = pc.cast(col, pa.timestamp("us"))
    return pc.cast(col, pa.int64())


def asof_join(left_ds, right_ds, *, key: str, left_on: str, right_on: str,
              left_tie: str | None = None, right_tie: str | None = None,
              right_cols: dict[str, str] | None = None,
              allow_exact: bool = False):
    """As-of join two Datasets on ``key``; ordering by (on, tie).

    Returns every left row with the matched right row's ``right_cols``
    (renamed per the dict) appended, null where no earlier right row
    exists.  ``allow_exact=True`` lets an exactly-equal (on, tie) tuple
    match (useful when left and right are distinct streams); the default
    strict mode is what a self-join ("previous row per key") needs.
    """
    left_schema = left_ds.schema()   # ray.data Schema: parallel names/types
    right_schema = right_ds.schema()
    if right_cols is None:
        right_cols = {n: f"r_{n}" for n in right_schema.names
                      if n not in (key, right_on, right_tie)}
    left_names = list(left_schema.names)
    right_field = dict(zip(right_schema.names, right_schema.types))
    out_right = list(right_cols.values())
    right_types = {out: right_field[src] for src, out in right_cols.items()}
    left_types = dict(zip(left_schema.names, left_schema.types))
    side_search = "right" if allow_exact else "left"

    def prep_left(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {"__k": batch[key], "__on": _as_int64(batch[left_on])}
        cols["__tie"] = (_as_int64(batch[left_tie]) if left_tie
                         else pa.nulls(n, pa.int64()))
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        for name in left_names:
            cols[f"l_{name}"] = batch[name]
        for name in out_right:
            cols[name] = pa.nulls(n, right_types[name])
        return pa.table(cols)

    def prep_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {"__k": batch[key], "__on": _as_int64(batch[right_on])}
        cols["__tie"] = (_as_int64(batch[right_tie]) if right_tie
                         else pa.nulls(n, pa.int64()))
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        for name in left_names:
            cols[f"l_{name}"] = pa.nulls(n, left_types[name])
        for src, name in right_cols.items():
            cols[name] = batch[src]
        return pa.table(cols)

    both = left_ds.map_batches(prep_left, batch_format="pyarrow").union(
        right_ds.map_batches(prep_right, batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group["__side"].to_numpy(zero_copy_only=False)
        left = group.filter(pa.array(side == 0))
        out_cols = {name: left[f"l_{name}"] for name in left_names}
        right = group.filter(pa.array(side == 1))
        nl = left.num_rows
        if nl == 0:
            return pa.table(
                {**{n: pa.nulls(0, left_types[n]) for n in left_names},
                 **{n: pa.nulls(0, right_types[n]) for n in out_right}})
        if right.num_rows == 0:
            for name in out_right:
                out_cols[name] = pa.nulls(nl, right_types[name])
            return pa.table(out_cols)
        right = right.sort_by([("__on", "ascending"), ("__tie", "ascending")])
        r_on = right["__on"].to_numpy(zero_copy_only=False)
        r_tie = right["__tie"].to_numpy(zero_copy_only=False)
        l_on = left["__on"].to_numpy(zero_copy_only=False)
        l_tie = left["__tie"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(r_on, l_on, side="left")
        idx = np.searchsorted(r_on, l_on, side=side_search)
        if left_tie or right_tie:
            hi = np.searchsorted(r_on, l_on, side="right")
            idx = lo.copy()
            for j in np.nonzero(hi > lo)[0]:  # only rows with on-ties
                idx[j] = lo[j] + np.searchsorted(
                    r_tie[lo[j]:hi[j]], l_tie[j], side=side_search)
        match = idx - 1
        have = pa.array(match >= 0)
        taken = np.maximum(match, 0)
        for name in out_right:
            col = right[name].take(pa.array(taken))
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            out_cols[name] = pc.if_else(have, col, pa.nulls(nl, right_types[name]))
        return pa.table(out_cols)

    return both.groupby("__k").map_groups(merge, batch_format="pyarrow")


def broadcast_enrich(ds, dims: pa.Table, *, stream_key: str, dim_key: str,
                     value_cols: list[str], concurrency: int = 2):
    """LEFT-join a stream Dataset against a small dimension table with no
    shuffle: the dimension is placed in the object store once (``ray.put``)
    and each actor builds its probe index once in ``__init__``."""
    import pandas as pd
    import ray

    ref = ray.put(dims)

    class Enrich:
        def __init__(self):
            tbl: pa.Table = ray.get(ref)
            self.lookup = tbl.to_pandas().set_index(dim_key)[value_cols]
            self.types = {c: tbl.schema.field(c).type for c in value_cols}

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch[stream_key].to_pandas()
            joined = self.lookup.reindex(keys)
            for c in value_cols:
                batch = batch.append_column(
                    c, pa.array(joined[c].to_numpy(), type=self.types[c],
                                from_pandas=True))
            return batch

    return ds.map_batches(Enrich, batch_format="pyarrow",
                          concurrency=concurrency)
