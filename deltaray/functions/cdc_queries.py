"""Generic last-writer-wins / change-apply operators over arbitrary keyed
streams — the engine's merge semantics (SURVEY.md §2.7) exposed as
reusable Dataset transforms, used by the driver-facing queries over the
``events`` table.

Pattern: phase-1 combine inside ``map_batches`` (keep only the max-order
row per key per batch) → small ``groupby(key).map_groups`` phase 2.  The
pre-reduction bounds shuffle volume by (#keys × #batches), not #events —
the same two-phase reduction the merge stage uses for hot keys.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from deltaray.functions.partition import group_codes, hash_partitioned


def _as_keys(key) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def _take_last_per_key(tbl: pa.Table, key, order: list[str]) -> pa.Table:
    """Max-(order tuple) row per (possibly composite) key, vectorized
    (stable sort + factorize) — handles any number of keys per block, so
    it serves both as the per-batch combiner and as the partition-wise
    finalizer."""
    if tbl.num_rows <= 1:
        return tbl
    tbl = tbl.sort_by([(c, "ascending") for c in order])
    codes = group_codes(tbl, _as_keys(key))
    _, first_rev = np.unique(codes[::-1], return_index=True)
    last_idx = np.sort(len(codes) - 1 - first_rev)
    if len(last_idx) == tbl.num_rows:
        return tbl
    return tbl.take(pa.array(last_idx))


def lww_latest(ds, key, order: list[str], columns: list[str] | None = None,
               num_partitions: int = 64):
    """Latest row per (possibly composite) key by (order...) — two-phase
    LWW over a Dataset.

    Engine-core analog: QueueingEventEmitter sequencing + merge LWW
    (Sequenced.java:26-53) applied to a generic table.  The finalizer
    runs partition-wise (O(P) UDF calls), not per key — key cardinality
    never shows up as Python-call overhead.
    """
    keys = _as_keys(key)
    need = None
    if columns is not None:
        need = list(dict.fromkeys([*keys, *order, *columns]))

    def combine(batch: pa.Table) -> pa.Table:
        if need is not None:
            batch = batch.select([c for c in need if c in batch.column_names])
        return _take_last_per_key(batch, keys, order)

    ds = ds.map_batches(combine, batch_format="pyarrow")
    return hash_partitioned(ds, keys,
                            lambda g: _take_last_per_key(g, keys, order),
                            num_partitions=num_partitions)


def apply_change_stream(ds, key: str, order: list[str], op_col_expr,
                        delete_ops: set[str], columns: list[str]):
    """CDC apply over a generic event table: latest row per key wins; keys
    whose winning row is a delete-op vanish (merge-stage semantics without
    a base table).  ``op_col_expr(batch) -> pa.Array`` maps each row to an
    op label."""

    keys = _as_keys(key)

    def combine(batch: pa.Table) -> pa.Table:
        ops = op_col_expr(batch)
        batch = batch.select([c for c in dict.fromkeys([*keys, *order, *columns])])
        batch = batch.append_column("__op", ops)
        return _take_last_per_key(batch, keys, order)

    ds = ds.map_batches(combine, batch_format="pyarrow")

    def finalize(block: pa.Table) -> pa.Table:
        win = _take_last_per_key(block, keys, order)
        mask = pc.invert(pc.is_in(win["__op"], value_set=pa.array(sorted(delete_ops))))
        return win.filter(mask).drop_columns(["__op"])

    return hash_partitioned(ds, keys, finalize)


def sessionize(ds, *, key: str, ts_col: str, tie_col: str,
               gap_minutes: float = 60.0, num_partitions: int = 64):
    """Gap-based session windows per key (SURVEY §2.9 commit-batch window
    generalized to event-time): sort a key's events by (ts, tie), start a
    new session whenever the gap to the previous event exceeds
    ``gap_minutes``, and emit one row per session with
    (key, session_id, n_events, start_ts, end_ts).

    One hash exchange; each partition block (MANY keys) is processed by a
    single fully-vectorized pass — sort → factorize → diff → cumsum —
    with zero per-key Python calls, so key cardinality only affects
    shuffle volume, never scheduler or interpreter overhead.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def sess_block(block: pa.Table) -> pa.Table:
        g = block.sort_by([(key, "ascending"), (ts_col, "ascending"),
                           (tie_col, "ascending")])
        ts = g[ts_col]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        t = pc.cast(pc.cast(ts, pa.timestamp("us")), pa.int64()).to_numpy()
        codes = group_codes(g, [key])
        n = len(t)
        newkey = np.ones(n, dtype=bool)
        newkey[1:] = codes[1:] != codes[:-1]
        brk = newkey.copy()
        brk[1:] |= np.diff(t) > gap_us           # session start markers
        starts = np.nonzero(brk)[0]
        counts = np.diff(np.append(starts, n))
        # per-key 0-based session index: session ordinal minus the ordinal
        # of its key's first session
        sess_ord = np.arange(len(starts))
        key_first = newkey[starts]
        key_of_sess = np.cumsum(key_first) - 1
        session_id = sess_ord - sess_ord[key_first][key_of_sess]
        last = starts + counts - 1
        return pa.table({
            key: g[key].take(pa.array(starts)),
            "session_id": pa.array(session_id.astype(np.int64)),
            "n_events": pa.array(counts.astype(np.int64)),
            "start_ts": ts.take(pa.array(starts)),
            "end_ts": ts.take(pa.array(last)),
        })

    return hash_partitioned(ds, [key], sess_block,
                            num_partitions=num_partitions)


def top_k_per_key(ds, *, key: str, order: list[tuple[str, str]], k: int,
                  num_partitions: int = 64):
    """Best-k rows per key by an (column, direction) order spec — e.g.
    keep the 3 highest-quality documents per source.

    The same vectorized block function serves as the per-batch combiner
    (bounding shuffle volume to k rows per key per batch) and the
    partition-wise finalizer; selection is sort + factorize + a
    repeat/arange gather, no per-key Python.
    """
    sort_spec = [(key, "ascending"), *order]

    def block_topk(block: pa.Table) -> pa.Table:
        if block.num_rows <= 1:
            return block
        g = block.sort_by(sort_spec)
        codes = group_codes(g, [key])
        _, first, counts = np.unique(codes, return_index=True,
                                     return_counts=True)
        take = np.minimum(counts, k)
        starts = np.repeat(first, take)
        within = np.arange(take.sum()) - np.repeat(
            np.cumsum(take) - take, take)
        return g.take(pa.array(starts + within))

    ds = ds.map_batches(block_topk, batch_format="pyarrow")
    return hash_partitioned(ds, [key], block_topk,
                            num_partitions=num_partitions)


def rank_per_key(ds, *, key: str, order: list[tuple[str, str]],
                 rn_col: str = "rn", num_partitions: int = 64):
    """``row_number() OVER (PARTITION BY key ORDER BY order)`` — the
    per-key ordering primitive (curriculum position, nth-event-per-user,
    dedup-rank).  Rank needs every row of a key together, so there is no
    per-batch combiner: ONE hash exchange co-locates keys, then each
    partition block is ranked fully vectorized (sort + group-run
    arithmetic, no per-key Python)."""
    sort_spec = [(key, "ascending"), *order]

    def block_rank(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.append_column(rn_col, pa.array([], pa.int64()))
        g = block.sort_by(sort_spec)
        codes = group_codes(g, [key])
        # g is key-sorted → codes are contiguous runs in first-appearance
        # order, so unique(sorted) == appearance order
        _, first, counts = np.unique(codes, return_index=True,
                                     return_counts=True)
        rn = np.arange(g.num_rows, dtype=np.int64) \
            - np.repeat(first, counts) + 1
        return g.append_column(rn_col, pa.array(rn))

    return hash_partitioned(ds, [key], block_rank,
                            num_partitions=num_partitions)


def lag_per_key(ds, *, key: str, order: list[tuple[str, str]], col: str,
                out_col: str | None = None, num_partitions: int = 64):
    """``LAG(col) OVER (PARTITION BY key ORDER BY order)`` — each row's
    previous value within its key (null on the key's first row): the
    general form of the engine's previousRow tracking, as a query-side
    operator.  One exchange; within a partition block the lagged column
    is a single vectorized take with null indices on key starts."""
    out_col = out_col or f"prev_{col}"
    sort_spec = [(key, "ascending"), *order]

    def block_lag(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block.append_column(
                out_col, block[col].slice(0, 0))
        g = block.sort_by(sort_spec)
        codes = group_codes(g, [key])
        n = g.num_rows
        is_first = np.empty(n, dtype=bool)
        is_first[0] = True
        np.not_equal(codes[1:], codes[:-1], out=is_first[1:])
        idx = np.arange(-1, n - 1, dtype=np.int64)
        prev = pc.take(g[col].combine_chunks(),
                       pa.array(idx, mask=is_first))
        return g.append_column(out_col, prev)

    return hash_partitioned(ds, [key], block_lag,
                            num_partitions=num_partitions)


def tumbling_window_agg(ds, *, key: str, ts_col: str,
                        window_minutes: int = 60):
    """Tumbling event-time windows: count of events per (key, window).

    Combiner-first: the window label is a derived column and per-batch
    partial counts collapse before the (small) groupby-sum, so shuffle
    volume is bounded by #(key, window) pairs per batch, not #events.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        w = pc.floor_temporal(batch[ts_col], multiple=window_minutes,
                              unit="minute")
        t = pa.table({key: batch[key], "window_start": w})
        agg = t.group_by([key, "window_start"]).aggregate([([], "count_all")])
        return agg.rename_columns([key, "window_start", "n_p"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([key, "window_start"]).aggregate(Sum("n_p", alias_name="n"))

    def fix_unit(batch: pa.Table) -> pa.Table:
        # Ray's aggregate can downcast the window label to timestamp[s];
        # pin [us] so the result type matches SQL oracles exactly
        i = batch.column_names.index("window_start")
        return batch.set_column(
            i, "window_start", batch["window_start"].cast(pa.timestamp("us")))

    return agg.map_batches(fix_unit, batch_format="pyarrow")


def upsert_into_base(base_ds, changes_tbl: pa.Table, base_key: str,
                     change_key: str, value_cols: list[str]):
    """Broadcast-merge a small change set into a large base Dataset:
    the Ray translation of the reference's target-side MERGE
    (EventConsumer.java:58-66) when the change side is small — the change
    table is put in the object store ONCE (ray.put) and probed per batch
    with pure-Arrow ``pc.index_in`` + ``take`` (type-preserving: an int
    value column with unmatched base keys stays int-with-nulls, never
    float64/NaN); no shuffle of the base.  Duplicate change keys resolve
    to the first occurrence."""
    import ray

    from deltaray.functions.partition import dedup_first_by_key

    deduped = dedup_first_by_key(changes_tbl, change_key)
    ref = ray.put((deduped[change_key].combine_chunks(),
                   {c: deduped[c].combine_chunks() for c in value_cols}))

    def upsert(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(ref)  # zero-copy local lookup after 1st fetch
        bk = batch[base_key]
        if bk.type != keys.type:
            bk = pc.cast(bk, keys.type)
        pos = pc.index_in(bk, value_set=keys)
        if isinstance(pos, pa.ChunkedArray):
            pos = pos.combine_chunks()
        for c in value_cols:
            batch = batch.append_column(c, vals[c].take(pos))
        return batch

    return base_ds.map_batches(upsert, batch_format="pyarrow")


def sliding_window_agg(ds, *, key: str, ts_col: str, value_col: str,
                       window_minutes: int, hop_minutes: int):
    """Sliding (hopping) event-time windows: per (key, window_start),
    count + sum(value) over every window of ``window_minutes`` advancing
    by ``hop_minutes``.

    Each event belongs to ``window/hop`` windows; the replication happens
    INSIDE the per-batch combiner and collapses to per-(key, window)
    partials immediately, so shuffle volume is bounded by
    #(key, window) pairs per batch — the window fan-out never reaches
    the exchange.  (The tumbling case is hop == window.)
    """
    from ray.data.aggregate import Sum

    if window_minutes % hop_minutes:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    k = window_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy()
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        keys = batch[key]
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        # last hop bucket whose window contains ts: floor(ts/hop); the
        # window starting at (b - j) * hop contains ts for j in [0, k)
        b = ts // hop_us
        n = len(ts)
        starts = ((np.repeat(b, k) - np.tile(np.arange(k), n)) * hop_us)
        rep_keys = keys.take(pa.array(np.repeat(np.arange(n), k)))
        rep_vals = np.repeat(vals, k)
        t = pa.table({
            key: rep_keys,
            "window_start": pa.array(starts).cast(pa.timestamp("us")),
            "v": pa.array(rep_vals),
        })
        agg = t.group_by([key, "window_start"]).aggregate(
            [("v", "sum"), ([], "count_all")])
        return agg.rename_columns([key, "window_start", "sum_p", "n_p"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([key, "window_start"]).aggregate(
            Sum("sum_p", alias_name="sum_value"),
            Sum("n_p", alias_name="n"))

    def fix_unit(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("window_start")
        return batch.set_column(
            i, "window_start", batch["window_start"].cast(pa.timestamp("us")))

    return agg.map_batches(fix_unit, batch_format="pyarrow")
