"""Small shared runtime helpers."""

from __future__ import annotations


def zorder_sort(tbl, cols: list[str]):
    """Sort an Arrow table by the Morton (Z-order) interleave of the
    columns' empirical ranks — multi-column locality so parquet
    row-group [min, max] stats stay tight on EVERY cluster column at
    once (the classic Z-order curve used by Delta Lake's OPTIMIZE
    ZORDER).  Ranks come from ``pc.rank`` (any orderable type, nulls
    last), quantized to 16 bits, bit-interleaved round-robin; 16 × k
    vectorized numpy passes, no per-row Python."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    if n <= 1:
        return tbl
    ranks = []
    for c in cols:
        r = pc.rank(tbl[c].combine_chunks(), sort_keys="ascending",
                    null_placement="at_end", tiebreaker="first") \
            .to_numpy(zero_copy_only=False).astype(np.uint64) - 1
        ranks.append(r * 65535 // max(n - 1, 1))
    k = len(ranks)
    key = np.zeros(n, np.uint64)
    for b in range(16):
        for j, r in enumerate(ranks):
            key |= ((r >> np.uint64(b)) & np.uint64(1)) \
                << np.uint64(b * k + j)
    return tbl.take(pa.array(np.argsort(key, kind="stable")))


def cluster_sort(tbl, cluster_by):
    """Apply a clustering spec to an Arrow table: a single column sorts
    linearly, a list Z-orders.  Missing columns are skipped (post-DDL
    mixed schemas); returns (table, columns_actually_used)."""
    cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
    present = [c for c in cols if c in tbl.column_names]
    if len(present) == 1:
        return tbl.sort_by([(present[0], "ascending")]), present
    if present:
        return zorder_sort(tbl, present), present
    return tbl, present


def auto_concurrency(lo: int = 1, cap: int | None = None) -> tuple[int, int]:
    """Actor-pool sizing for ``map_batches`` stages: autoscale between
    ``lo`` and the cluster CPU count (queried at call time), so stateful
    stages neither starve a 32-CPU box with a fixed 2-actor pool nor
    oversubscribe a small one.  On a multi-node cluster
    ``ray.cluster_resources()`` reflects every node, so pools grow with
    the cluster without config changes."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - ray missing entirely
        ncpu = 0
    hi = max(lo, ncpu or 8)
    if cap is not None:
        hi = min(hi, max(lo, cap))
    return (lo, hi)


def to_table(ds, *, fallback_schema=None):
    """Materialize a (small) Dataset as one pyarrow.Table, preserving the
    schema even when the result has zero rows.

    Ray 2.49's ``Dataset.to_pandas()`` returns a column-less DataFrame for
    any empty dataset, and intermediate ``repartition`` can pad the plan
    with schema-less empty blocks that bypass ``map_batches`` UDFs — so an
    operator whose output happens to be empty (e.g. chunking a corpus of
    zero-token docs) loses its schema at the driver.  This helper
    concatenates the non-degenerate Arrow batches and, when none exist,
    builds a typed empty table from ``ds.schema()`` (which Ray derives
    correctly from the plan) or ``fallback_schema``.

    Driver-side materialization — use ONLY on small results (reports,
    lineage, test assertions), never on the bulk data path.
    """
    import pyarrow as pa

    batches = [
        b
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_columns
    ]
    if batches:
        return pa.concat_tables(batches, promote_options="default")
    schema = fallback_schema
    if schema is None:
        s = ds.schema()
        if s is not None:
            schema = pa.schema(
                [pa.field(n, t) for n, t in zip(s.names, s.types)]
            )
    if schema is None:  # pragma: no cover - schema genuinely unknowable
        return pa.table({})
    return pa.table({f.name: pa.array([], f.type) for f in schema})


def to_pandas(ds, *, fallback_schema=None):
    """``to_table(...).to_pandas()`` — empty-result-safe driver fetch."""
    return to_table(ds, fallback_schema=fallback_schema).to_pandas()
