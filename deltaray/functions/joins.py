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
              allow_exact: bool = False, num_partitions: int = 64):
    """As-of join two Datasets on ``key``; ordering by (on, tie).

    Returns every left row with the matched right row's ``right_cols``
    (renamed per the dict) appended, null where no earlier right row
    exists.  ``allow_exact=True`` lets an exactly-equal (on, tie) tuple
    match (useful when left and right are distinct streams); the default
    strict mode is what a self-join ("previous row per key") needs.

    The merge runs once per HASH PARTITION of the key space (not once per
    key): a partition block holds both sides for many keys, sorted once;
    per key only the numpy ``searchsorted`` runs.  Key cardinality
    therefore never multiplies scheduler or interpreter overhead.
    """
    from deltaray.functions.partition import hash_partitioned
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
                         else pa.array(np.zeros(n, dtype=np.int64)))
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
                         else pa.array(np.zeros(n, dtype=np.int64)))
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        for name in left_names:
            cols[f"l_{name}"] = pa.nulls(n, left_types[name])
        for src, name in right_cols.items():
            cols[name] = batch[src]
        return pa.table(cols)

    both = left_ds.map_batches(prep_left, batch_format="pyarrow").union(
        right_ds.map_batches(prep_right, batch_format="pyarrow")
    )
    has_tie = bool(left_tie or right_tie)

    def merge_block(block: pa.Table) -> pa.Table:
        from deltaray.functions.partition import group_codes

        # one sort for ALL keys in the partition: key, then left-before-
        # right, each side ordered by (on, tie)
        g = block.sort_by([("__k", "ascending"), ("__side", "ascending"),
                          ("__on", "ascending"), ("__tie", "ascending")])
        kcodes = group_codes(g, ["__k"])
        side = g["__side"].to_numpy(zero_copy_only=False)
        on = g["__on"].to_numpy(zero_copy_only=False)
        tie = g["__tie"].to_numpy(zero_copy_only=False)
        first = np.unique(kcodes, return_index=True)[1]
        ends = np.append(first[1:], len(kcodes))
        match = np.full(len(kcodes), -1, dtype=np.int64)  # global right idx
        for s, e in zip(first, ends):
            mid = s + np.searchsorted(side[s:e], 1)  # left rows: [s, mid)
            if mid == s or mid == e:                 # no left or no right
                continue
            r_on, r_tie = on[mid:e], tie[mid:e]
            l_on, l_tie = on[s:mid], tie[s:mid]
            lo = np.searchsorted(r_on, l_on, side="left")
            if has_tie:
                hi = np.searchsorted(r_on, l_on, side="right")
                idx = lo.copy()
                for j in np.nonzero(hi > lo)[0]:  # only rows with on-ties
                    idx[j] = lo[j] + np.searchsorted(
                        r_tie[lo[j]:hi[j]], l_tie[j], side=side_search)
            else:
                idx = np.searchsorted(r_on, l_on, side=side_search)
            m = idx - 1
            match[s:mid] = np.where(m >= 0, mid + m, -1)
        left_rows = np.nonzero(side == 0)[0]
        left_tbl = g.take(pa.array(left_rows))
        out_cols = {name: left_tbl[f"l_{name}"] for name in left_names}
        nl = len(left_rows)
        match_l = match[left_rows]
        have = pa.array(match_l >= 0)
        taken = pa.array(np.maximum(match_l, 0))
        for name in out_right:
            col = g[name].take(taken)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            out_cols[name] = pc.if_else(have, col, pa.nulls(nl, right_types[name]))
        return pa.table(out_cols)

    return hash_partitioned(both, ["__k"], merge_block,
                            num_partitions=num_partitions)


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
