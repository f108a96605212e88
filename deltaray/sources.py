"""Source adapters: normalize foreign change-log formats into the engine's
Parquet event-log layout.

Reference parity: DeltaSource plugins tail arbitrary databases and their
TableRegistry ``standardize()`` converts source-native rows into the
engine's schema (delta-api/.../api/DeltaSource.java:26-68,
TableRegistry.java:63-70).  Here the equivalent contract is "produce
Parquet segments + manifest.json under one directory"; adapters below do
that for JSONL (and are the template for any other format): a distributed
``ray.data.read_json`` pass re-encodes each input shard as a seq-ordered
Parquet segment with small row groups so the replay path can split reads.

The replay engine itself stays format-agnostic — it only ever sees the
normalized log (pipeline.discover_segments).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from deltaray.schemas import TableSchema, event_log_schema


def _conform(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name in tbl.column_names:
            cols.append(tbl[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(tbl.num_rows, f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def normalize_jsonl_log(src: str, out_dir: str, table_schema: TableSchema,
                        segment_max_events: int = 1_000_000,
                        assume_sorted: bool = False,
                        local_sort: bool = False) -> dict:
    """Convert a directory (or glob) of JSONL change-event shards into the
    engine's Parquet event-log layout; returns the manifest.

    Events must carry ``seq``/``op``/``table`` plus payload columns; shards
    may be unsorted — rows are ordered by seq within each output segment
    and segments are emitted in global seq order (one pass, distributed
    read + driver-side ordered write of segment boundaries).
    """
    import ray.data

    paths = _shards(src, "*.jsonl")
    ds = ray.data.read_json(paths)
    return _write_segments(ds, out_dir, table_schema, segment_max_events,
                           source_format="jsonl", src=src,
                           assume_sorted=assume_sorted, local_sort=local_sort)


def normalize_csv_log(src: str, out_dir: str, table_schema: TableSchema,
                      segment_max_events: int = 1_000_000,
                      list_cols: tuple = ("tokens", "prev_tokens"),
                      assume_sorted: bool = False,
                      local_sort: bool = False) -> dict:
    """Same contract for CSV shards.  List-typed payload columns (e.g.
    ``tokens``) must be JSON-encoded strings in the CSV; they are parsed
    back into Arrow lists during normalization."""
    import ray.data

    paths = _shards(src, "*.csv")

    def parse_lists(batch: pa.Table) -> pa.Table:
        for c in list_cols:
            if c in batch.column_names and pa.types.is_string(batch[c].type):
                vals = [None if not v else json.loads(v)
                        for v in batch[c].to_pylist()]  # "" = absent
                batch = batch.set_column(
                    batch.column_names.index(c), c,
                    pa.array(vals, pa.list_(pa.int32())))
        return batch

    ds = ray.data.read_csv(paths).map_batches(parse_lists,
                                              batch_format="pyarrow")
    return _write_segments(ds, out_dir, table_schema, segment_max_events,
                           source_format="csv", src=src,
                           assume_sorted=assume_sorted, local_sort=local_sort)


def normalize_parquet_log(src: str, out_dir: str, table_schema: TableSchema,
                          segment_max_events: int = 1_000_000,
                          column_map: dict[str, str] | None = None,
                          assume_sorted: bool = False,
                          local_sort: bool = False) -> dict:
    """Same contract for foreign Parquet shards: an optional
    ``column_map`` ({source_name: engine_name}) renames source-native
    columns into the engine's event-log schema before segmenting —
    the ``standardize()`` hook for parquet-speaking sources."""
    import ray.data

    paths = _shards(src, "*.parquet")
    ds = ray.data.read_parquet(paths)
    if column_map:
        def rename(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [column_map.get(c, c) for c in batch.column_names])

        ds = ds.map_batches(rename, batch_format="pyarrow")
    return _write_segments(ds, out_dir, table_schema, segment_max_events,
                           source_format="parquet", src=src,
                           assume_sorted=assume_sorted, local_sort=local_sort)


def _shards(src: str, pattern: str) -> list[str]:
    paths = sorted(glob.glob(src if any(ch in src for ch in "*?[") else
                             os.path.join(src, pattern)))
    if not paths:
        raise FileNotFoundError(f"no {pattern} shards under {src!r}")
    return paths


def _write_segments(ds, out_dir: str, table_schema: TableSchema,
                    segment_max_events: int, *, source_format: str,
                    src: str, assume_sorted: bool = False,
                    local_sort: bool = False) -> dict:
    """Distributed segment sink: after the (distributed) ``sort("seq")``,
    every ~``segment_max_events``-row batch is written to its own Parquet
    segment BY THE MAP TASK that holds it — rows never stream through the
    driver; only the tiny per-segment manifest rows do.  Segment names
    embed the batch's (seq_lo, seq_hi), which are globally unique and
    non-overlapping because ``seq`` is unique, so concurrent writers never
    collide and a re-run overwrites deterministically (atomic tmp+rename).
    Assumes ``out_dir`` is on the shared lake filesystem (same contract as
    the commit log)."""
    import tempfile

    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    log_schema = event_log_schema(table_schema)
    manifest_schema = pa.schema([("path", pa.string()), ("seq_lo", pa.int64()),
                                 ("seq_hi", pa.int64()), ("n_rows", pa.int64()),
                                 ("has_ddl", pa.bool_())])

    def write_one(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return manifest_schema.empty_table()
        if local_sort:
            batch = batch.sort_by("seq")
        tbl = _conform(batch, log_schema)
        lo = int(pc.min(tbl["seq"]).as_py())
        hi = int(pc.max(tbl["seq"]).as_py())
        path = os.path.join(out_dir, f"events-{lo:012d}-{hi:012d}.parquet")
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        # small row groups: the replay path splits one segment across many
        # read tasks (row group = the parquet split unit)
        pq.write_table(tbl, tmp, row_group_size=16384)
        os.replace(tmp, path)
        from deltaray.schemas import DDL_OPS

        has_ddl = bool(pc.any(pc.is_in(
            tbl["op"], value_set=pa.array(list(DDL_OPS)))).as_py())
        return pa.table({"path": [path], "seq_lo": [lo], "seq_hi": [hi],
                         "n_rows": [tbl.num_rows], "has_ddl": [has_ddl]},
                        schema=manifest_schema)

    # order by seq so segment files carry tight, non-overlapping seq
    # ranges.  ``assume_sorted`` skips the (all-to-all) global sort for
    # append-style sources whose shards are already seq-ordered — safe
    # even when mis-declared: replay filters by seq range at read time,
    # overlapping segment ranges only loosen row-group pruning, never
    # correctness.
    # ``local_sort`` drops the exchange entirely for 100-TB foreign
    # logs: each batch sorts by seq LOCALLY and writes its own segment,
    # so normalization is a pure streaming map with zero shuffle.  The
    # resulting segment seq ranges may overlap across shards — replay
    # filters every read by seq range, so overlap only loosens row-group
    # pruning (read amplification bounded by how well the source shards
    # correlate with seq), never correctness (plan_chunks boundaries
    # bisecting a segment just read it from both chunks with disjoint
    # filters).  Use for roughly-seq-ordered shards; fall back to the
    # global sort when shards interleave seq ranges adversarially.
    ordered = ds if (assume_sorted or local_sort) else ds.sort("seq")
    seg_rows = ordered.map_batches(
        write_one, batch_format="pyarrow", batch_size=segment_max_events
    ).take_all()  # tiny: one row per written segment
    segments = [
        {"path": r["path"], "seq_lo": int(r["seq_lo"]),
         "seq_hi": int(r["seq_hi"]), "n_rows": int(r["n_rows"]),
         "columns": log_schema.names, "has_ddl": bool(r["has_ddl"])}
        for r in sorted(seg_rows, key=lambda r: r["seq_lo"])
    ]
    max_seq = max((s["seq_hi"] for s in segments), default=0)
    manifest = {"segments": segments, "max_seq": max_seq,
                "source_format": source_format, "source": src}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def feed_to_events(feed: pa.Table, table_schema: TableSchema,
                   table: str | None = None) -> pa.Table:
    """Convert a :func:`deltaray.read_changes` feed into event-log rows
    — the adapter that CHAINS lakes: a downstream deltaray lake can
    replay an upstream lake's change feed as its own source, the Ray
    translation of the reference's replication chain (a DeltaTarget's
    output consumed by another DeltaSource).

    Mapping: feed ``seq`` (the upstream winning version) becomes the
    event seq UNCHANGED — downstream LWW then resolves identically to
    upstream and re-applying an overlapping pull is an idempotent
    no-op; UPSERT→UPDATE (insert-vs-update only affects metric counts
    under upsert semantics), DELETE→DELETE with null payload (synthetic
    TRUNCATE deletes chain through as ordinary deletes); ``source_ts``
    is synthesized deterministically from seq so ordering metrics and
    watermarks stay monotone.  Write the result as a segment file named
    ``events-<n>-<lo12>-<hi12>.parquet`` in the downstream log dir and
    replay — consecutive pulls anchored at committed watermarks form a
    legal ORDERED log (each pull's seqs lie in (since, as_of]).

    DDL does not chain: the feed carries data changes only, under the
    upstream schema effective at the pull's as-of anchor.  When the
    upstream evolves (ADD/RENAME/ALTER), emit the same DDL event into
    the downstream log (``ddl_payload``) at a seq inside the gap
    before the next pull — ``table_schema`` here must always be the
    schema the FEED is under."""
    schema = event_log_schema(table_schema)
    name = table or table_schema.name
    n = feed.num_rows
    seq = feed["seq"].combine_chunks().cast(pa.int64())
    cols = {}
    for f in schema:
        if f.name == "seq":
            cols[f.name] = seq
        elif f.name == "op":
            cols[f.name] = pc.if_else(
                pc.equal(feed["change"], "DELETE"),
                pa.scalar("DELETE"), pa.scalar("UPDATE"))
        elif f.name == "table":
            cols[f.name] = pa.array([name] * n, pa.string())
        elif f.name == "is_snapshot":
            cols[f.name] = pa.array([False] * n, pa.bool_())
        elif f.name == "source_ts":
            cols[f.name] = pc.multiply(seq, pa.scalar(1000, pa.int64())) \
                .cast(pa.timestamp("us"))
        elif f.name in feed.column_names:
            cols[f.name] = feed[f.name].combine_chunks().cast(f.type)
        else:
            cols[f.name] = pa.nulls(n, f.type)
    return pa.table(cols, schema=schema).sort_by([("seq", "ascending")])


def export_table(lake_root: str, table: str, dest: str, fmt: str = "parquet",
                 generation: int = 0, with_previous: bool = False) -> str:
    """Sink adapter: export a lake table's current state (DeltaTarget
    analog for downstream consumers that want plain files).  Streams via
    read_table_ds; partitioned output, never one giant file.
    ``with_previous=True`` (lake replayed with ``track_previous``)
    includes each row's before-image — the audit / delete-semantics
    target shape (DMLEvent.previousRow, DMLEvent.java:66-72)."""
    from deltaray.pipeline import read_table_ds

    ds = read_table_ds(lake_root, table, generation,
                       with_previous=with_previous)
    os.makedirs(dest, exist_ok=True)
    if fmt == "parquet":
        ds.write_parquet(dest)
    elif fmt == "csv":
        # token lists don't fit CSV — stringify them
        def to_str(batch: pa.Table) -> pa.Table:
            for c in batch.column_names:
                if pa.types.is_list(batch[c].type):
                    col = pa.array([json.dumps(v.as_py()) for v in batch[c]])
                    batch = batch.set_column(batch.column_names.index(c), c, col)
            return batch

        ds.map_batches(to_str, batch_format="pyarrow").write_csv(dest)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    return dest
