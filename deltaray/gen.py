"""Deterministic synthetic base table + change-event log generator.

Plays the role of the reference's mock source
(delta-test/.../mock/MockEventReader.java:35-83 replays a pre-set event
list; delta-test harness events are built in
DeltaPipelineStateStoreBaseTest.java:83-116): a seeded generator writes a
Parquet event log that the engine replays and the oracle defines semantics
for.  Everything is derived from ``seed`` — same seed, same log.

Log layout (FIXTURES.md §2): ``out_dir/events-<segid>-<lo>-<hi>.parquet``
segments; a new segment starts at every DDL event (so no file spans a
schema change) and every ``segment_max_events`` rows (file-level seq
pruning for resume).  A ``manifest.json`` lists segments.

Event mix: 60% UPDATE / 25% INSERT / 15% DELETE over a Zipf-ish key
distribution (hot keys exercise the two-phase LWW pre-reduction).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from deltaray.schemas import (
    DDL_OPS,
    TableSchema,
    ddl_payload,
    default_table_schema,
    event_log_schema,
    apply_ddl,
)

VOCAB = 50257
EPOCH_US = 1704067200_000000  # 2024-01-01 UTC in microseconds
SOURCES = ("web", "books", "code", "wiki")


def _token_lists(rng: np.random.Generator, n: int, max_len: int = 64) -> pa.ListArray:
    """n random token arrays, lengths 1..max_len, values [0, VOCAB)."""
    lens = rng.integers(1, max_len + 1, size=n, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    values = rng.integers(0, VOCAB, size=int(offsets[-1]), dtype=np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(values))


def gen_base(n_docs: int, seed: int = 42, table: str = "docs") -> pa.Table:
    """Initial snapshot table of the input_hint shape
    (doc_id:string, tokens:list<int32>, n_tok:int32, source:string)."""
    rng = np.random.default_rng(seed)
    doc_id = pa.array([f"{table}-doc{i:08d}" for i in range(n_docs)])
    tokens = _token_lists(rng, n_docs)
    n_tok = pa.compute.list_value_length(tokens).cast(pa.int32())
    source = pa.array(rng.choice(SOURCES, size=n_docs))
    return pa.table(
        {"doc_id": doc_id, "tokens": tokens, "n_tok": n_tok, "source": source}
    )


def _zipf_probs(n: int, a: float) -> np.ndarray:
    p = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** a
    return p / p.sum()


class _TableState:
    """Per-table generation state: live keys + current rows (for prev_tokens
    and for the extra DDL-added payload columns)."""

    def __init__(self, name: str, n_docs: int, rng: np.random.Generator):
        self.name = name
        self.schema = default_table_schema(name)
        self.base = gen_base(n_docs, int(rng.integers(0, 2**31)), table=name)
        self.next_id = n_docs
        # key -> tokens (python list) for prev_tokens tracking
        self.tokens: dict[str, list[int]] = {}
        self.extra_cols: list[tuple[str, list[str]]] = []  # (name, choices)


def write_event_log(
    out_dir: str,
    *,
    n_docs: int = 1_000,
    n_events: int = 5_000,
    seed: int = 42,
    tables: tuple[str, ...] = ("docs",),
    ddl: list[tuple[int, str, str, dict]] | None = None,
    unordered: bool = False,
    track_prev: bool = True,
    zipf_a: float = 1.1,
    hot_key_frac: float = 0.0,
    segment_max_events: int = 250_000,
    mix: tuple[float, float, float] = (0.25, 0.60, 0.15),  # INSERT/UPDATE/DELETE
) -> dict:
    """Write a change-event log; returns the manifest (also saved as
    ``manifest.json``).

    ``ddl``: list of (stream_index, table, op, kwargs); kwargs per op:
      ALTER_TABLE  {"add": (name, code), "choices": [...]} (string cols)
                   or {"alter": (name, new_code)} (column type change)
      RENAME_COLUMN {"rename": (old, new)}
      TRUNCATE_TABLE {}
      DROP_TABLE {}
    ``hot_key_frac``: fraction of UPDATE/DELETE events aimed at one single
    hot key (skew scenario; north_rule salting test).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    ddl = sorted(ddl or [], key=lambda d: d[0])

    states = {t: _TableState(t, n_docs, rng) for t in tables}

    seq = 0
    segid = 0
    segments: list[dict] = []

    def write_segment(rows: list[dict], schema_union: pa.Schema):
        nonlocal segid
        if not rows:
            return
        lo, hi = rows[0]["seq"], rows[-1]["seq"]
        cols = {}
        for f in schema_union.names:
            cols[f] = [r.get(f) for r in rows]
        tbl = pa.table(cols, schema=schema_union)
        path = os.path.join(out_dir, f"events-{segid:05d}-{lo:012d}-{hi:012d}.parquet")
        # small row groups so distributed readers can split one segment
        # file across many read tasks (row-group = the parquet split unit)
        pq.write_table(tbl, path, row_group_size=16384)
        segments.append(
            {
                "path": path,
                "seq_lo": int(lo),
                "seq_hi": int(hi),
                "n_rows": len(rows),
                "columns": schema_union.names,
                # lets replay skip the DDL scan for pure-DML segments
                "has_ddl": any(r["op"] in DDL_OPS for r in rows),
            }
        )
        segid += 1

    def union_schema() -> pa.Schema:
        """Union of meta + all live tables' payload columns.  With every
        table dropped (DDL-only buffer) fall back to the default payload
        shape — the rows carry only meta columns anyway."""
        fields: dict[str, pa.Field] = {}
        live = states.values() or [_TableState(tables[0], 0, rng)]
        for st in live:
            s = event_log_schema(st.schema)
            for f in s:
                if f.name not in fields:
                    fields[f.name] = f
        # stable order: seq/op/table, payload cols in first-seen order, meta tail
        names = list(fields)
        return pa.schema([fields[n] for n in names])

    buffer: list[dict] = []

    def flush():
        nonlocal buffer
        write_segment(buffer, union_schema())
        buffer = []

    def ts_of(s: int) -> int:
        return EPOCH_US + s * 1000

    def emit(row: dict):
        nonlocal seq
        seq += 1
        row["seq"] = seq
        row.setdefault("ingest_ts", ts_of(seq))
        row.setdefault("source_ts", ts_of(seq))
        row.setdefault("is_snapshot", False)
        buffer.append(row)
        if len(buffer) >= segment_max_events:
            flush()

    # ---------------- snapshot phase: CREATE_TABLE + base INSERTs ----------
    for t in tables:
        st = states[t]
        emit(
            {
                "op": "CREATE_TABLE",
                "table": t,
                "ddl_payload": ddl_payload("CREATE_TABLE", schema=st.schema),
                "is_snapshot": True,
            }
        )
        b = st.base
        toks_col = b["tokens"].to_pylist()
        ids = b["doc_id"].to_pylist()
        srcs = b["source"].to_pylist()
        for i in range(len(ids)):
            st.tokens[ids[i]] = toks_col[i]
            emit(
                {
                    "op": "INSERT",
                    "table": t,
                    "doc_id": ids[i],
                    "tokens": toks_col[i],
                    "n_tok": len(toks_col[i]),
                    "source": srcs[i],
                    "is_snapshot": True,
                }
            )

    # ---------------- streaming phase -------------------------------------
    p_ins, p_upd, p_del = mix
    ops = rng.choice(
        np.array(["INSERT", "UPDATE", "DELETE"]), size=n_events, p=[p_ins, p_upd, p_del]
    )
    tbl_choice = rng.choice(np.array(list(tables)), size=n_events)
    zipf_p = {t: _zipf_probs(n_docs, zipf_a) for t in tables}
    key_ranks = rng.choice(n_docs, size=n_events, p=zipf_p[tables[0]])
    hot_mask = rng.random(n_events) < hot_key_frac
    tok_arrays = _token_lists(rng, n_events)
    tok_lists = tok_arrays.to_pylist()
    src_choice = rng.choice(SOURCES, size=n_events)
    extra_vals = rng.random(n_events)  # reused for DDL-added column choices

    # unordered timing: pair up events so source_ts has duplicates resolved
    # by sort_keys (SortKey tiebreaker, SortKey.java:26-41); a bounded-window
    # permutation makes arrival order != logical order.
    if unordered:
        offs = np.arange(n_events, dtype=np.int64)
        W = 16
        for blk in range(0, n_events - (n_events % W), W):
            offs[blk : blk + W] = offs[blk : blk + W][rng.permutation(W)]
        src_ts_off = offs // 2  # duplicates in pairs
    ddl_iter = iter(ddl)
    next_ddl = next(ddl_iter, None)

    for i in range(n_events):
        while next_ddl is not None and next_ddl[0] <= i:
            _, dt, dop, kw = next_ddl
            st = states.get(dt)
            flush()  # DDL barrier: no segment spans a schema change
            payload_kw: dict = {}
            if dop == "ALTER_TABLE" and "add" in kw:
                payload_kw["add"] = kw["add"]
            if dop == "ALTER_TABLE" and "alter" in kw:
                payload_kw["alter"] = kw["alter"]
            if dop == "ALTER_TABLE" and "drop" in kw:
                payload_kw["drop"] = kw["drop"]
            if dop == "RENAME_COLUMN":
                payload_kw["rename"] = kw["rename"]
            if dop == "CREATE_TABLE" and st is None:
                # mid-stream recreate (after DROP_TABLE): fresh empty table
                st = _TableState(dt, 0, rng)
                states[dt] = st
                payload_kw["schema"] = st.schema
            emit(
                {
                    "op": dop,
                    "table": dt,
                    "ddl_payload": ddl_payload(dop, **payload_kw),
                }
            )
            flush()
            if st is not None:
                new_schemas = apply_ddl(
                    {dt: st.schema}, dt, dop, ddl_payload(dop, **payload_kw), seq
                )
                if dop == "ALTER_TABLE" and "add" in kw \
                        and kw["add"][1] == "string":
                    # choices drive value synthesis for string columns
                    # only; numeric adds (e.g. a re-added n_tok) fall to
                    # the base emitter's special cases or stay null
                    st.extra_cols.append((kw["add"][0], kw.get("choices", ["x", "y", "z"])))
                if dop == "ALTER_TABLE" and "drop" in kw:
                    st.extra_cols = [
                        (n, c) for n, c in st.extra_cols if n != kw["drop"]
                    ]
                if dop == "RENAME_COLUMN":
                    old, new = kw["rename"]
                    st.extra_cols = [
                        (new if n == old else n, c) for n, c in st.extra_cols
                    ]
                if dop == "TRUNCATE_TABLE":
                    st.tokens.clear()
                if dop == "DROP_TABLE":
                    del states[dt]
                else:
                    st.schema = new_schemas[dt]
            next_ddl = next(ddl_iter, None)

        t = str(tbl_choice[i])
        if t not in states:
            continue
        st = states[t]
        op = str(ops[i])
        row: dict = {"op": op, "table": t}
        key_col = st.schema.key
        if op == "INSERT":
            st.next_id += 1
            key = f"{t}-doc{st.next_id:08d}"
        else:
            rank = 0 if hot_mask[i] else int(key_ranks[i])
            key = f"{t}-doc{rank:08d}"
        row[key_col] = key
        if unordered:
            row["source_ts"] = ts_of(0) + int(src_ts_off[i]) * 1000 + 10**12
            # two-component sort keys: sk0 collides within a ts pair so the
            # second component (and then seq) must break ties
            row["sort_keys"] = [int(src_ts_off[i]) % 3, seq + 1]
        if op == "DELETE":
            if track_prev:
                row["prev_tokens"] = st.tokens.get(key)
            st.tokens.pop(key, None)
        else:
            toks = tok_lists[i]
            if op == "UPDATE" and track_prev:
                row["prev_tokens"] = st.tokens.get(key)
            st.tokens[key] = toks
            # payload columns under the *current* schema
            names = {n for n, _ in st.schema.fields}
            tok_name = "tokens" if "tokens" in names else next(
                (n for o, n in st.schema.renames.items() if o == "tokens"), "tokens"
            )
            row[tok_name] = toks
            if "n_tok" in names:
                row["n_tok"] = len(toks)
            src_name = "source" if "source" in names else st.schema.renames.get(
                "source", None
            )
            if src_name and src_name in names:
                row[src_name] = str(src_choice[i])
            for cname, choices in st.extra_cols:
                if cname in names:
                    row[cname] = choices[int(extra_vals[i] * len(choices)) % len(choices)]
        emit(row)

    flush()
    manifest = {
        "seed": seed,
        "n_docs": n_docs,
        "n_events": n_events,
        "tables": list(tables),
        "unordered": unordered,
        "max_seq": seq,
        "segments": segments,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def write_event_log_fast(
    out_dir: str,
    *,
    n_docs: int = 100_000,
    n_events: int = 1_000_000,
    seed: int = 42,
    table: str = "docs",
    segment_max_events: int = 1_000_000,
    zipf_a: float = 1.1,
    mix: tuple[float, float, float] = (0.25, 0.60, 0.15),
    max_tok: int = 64,
) -> dict:
    """Fully vectorized event-log writer for BENCH-scale logs (tens of
    millions of events): single ORDERED table, CREATE_TABLE + snapshot
    INSERTs + a zipf-keyed INSERT/UPDATE/DELETE stream, no prev-row
    tracking.  Semantically a subset of ``write_event_log`` (same schema,
    same replay result shape); ~100x faster because every column is built
    with numpy/Arrow kernels, never per-row Python.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    schema = default_table_schema(table)
    log_schema = event_log_schema(schema)
    segments: list[dict] = []
    segid = 0

    def doc_ids(ranks: np.ndarray) -> pa.Array:
        # "{table}-doc{rank:08d}" vectorized via numpy unicode kernels
        s = np.char.zfill(ranks.astype("U8"), 8)
        return pa.array(np.char.add(f"{table}-doc", s))

    def write_seg(cols: dict) -> None:
        nonlocal segid
        n = len(cols["seq"])
        arrays, names = [], []
        for f in log_schema:
            names.append(f.name)
            if f.name in cols:
                a = cols[f.name]
                arrays.append(a if isinstance(a, (pa.Array, pa.ChunkedArray))
                              else pa.array(a, type=f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        tbl = pa.Table.from_arrays(arrays, names=names)
        lo = int(cols["seq"][0])
        hi = int(cols["seq"][-1])
        path = os.path.join(out_dir, f"events-{segid:05d}-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(tbl, path, row_group_size=16384)
        has_ddl = bool(pa.compute.any(pa.compute.is_in(
            tbl["op"], value_set=pa.array(list(DDL_OPS)))).as_py())
        segments.append({"path": path, "seq_lo": lo, "seq_hi": hi,
                         "n_rows": n, "columns": names, "has_ddl": has_ddl})
        segid += 1

    # -- snapshot: CREATE_TABLE + base INSERTs ------------------------------
    seq0 = 1
    write_seg({
        "seq": np.array([seq0], dtype=np.int64),
        "op": pa.array(["CREATE_TABLE"]),
        "table": pa.array([table]),
        "ddl_payload": pa.array([ddl_payload("CREATE_TABLE", schema=schema)]),
        "is_snapshot": pa.array([True]),
        "ingest_ts": pa.array([EPOCH_US + seq0 * 1000], pa.timestamp("us")),
        "source_ts": pa.array([EPOCH_US + seq0 * 1000], pa.timestamp("us")),
    })

    def emit_dml(seq_lo: int, ranks: np.ndarray, ops: pa.Array,
                 has_payload: np.ndarray, snapshot: bool) -> None:
        """Write DML rows [seq_lo, seq_lo+n) in segment_max_events slices."""
        n = len(ranks)
        for s0 in range(0, n, segment_max_events):
            s1 = min(s0 + segment_max_events, n)
            m = s1 - s0
            toks = _token_lists(rng, m, max_len=max_tok)
            seqs = np.arange(seq_lo + s0, seq_lo + s1, dtype=np.int64)
            ts = pa.array(EPOCH_US + seqs * 1000, pa.timestamp("us"))
            hp = has_payload[s0:s1]
            tokens = pc.if_else(pa.array(hp), toks, pa.nulls(m, toks.type))
            n_tok = pc.if_else(
                pa.array(hp),
                pc.list_value_length(toks).cast(pa.int32()),
                pa.nulls(m, pa.int32()),
            )
            source = pc.if_else(
                pa.array(hp),
                pa.array(rng.choice(SOURCES, size=m)),
                pa.nulls(m, pa.string()),
            )
            write_seg({
                "seq": seqs,
                "op": ops.slice(s0, m),
                "table": pa.array(np.full(m, table)),
                "doc_id": doc_ids(ranks[s0:s1]),
                "tokens": tokens,
                "n_tok": n_tok,
                "source": source,
                "ingest_ts": ts,
                "source_ts": ts,
                "is_snapshot": pa.array(np.full(m, snapshot)),
            })

    emit_dml(seq0 + 1, np.arange(n_docs, dtype=np.int64),
             pa.array(np.full(n_docs, "INSERT")),
             np.ones(n_docs, dtype=bool), snapshot=True)

    # -- stream: zipf-keyed mixed DML ---------------------------------------
    ops_np = rng.choice(np.array(["INSERT", "UPDATE", "DELETE"]),
                        size=n_events, p=list(mix))
    ins_mask = ops_np == "INSERT"
    ranks = rng.choice(n_docs, size=n_events, p=_zipf_probs(n_docs, zipf_a))
    # INSERTs target fresh ids: n_docs, n_docs+1, ... in stream order
    ranks[ins_mask] = n_docs + np.arange(int(ins_mask.sum()), dtype=np.int64)
    emit_dml(seq0 + n_docs + 1, ranks, pa.array(ops_np),
             ops_np != "DELETE", snapshot=False)

    max_seq = seq0 + n_docs + n_events
    manifest = {
        "seed": seed, "n_docs": n_docs, "n_events": n_events,
        "tables": [table], "unordered": False, "max_seq": max_seq,
        "segments": segments,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def write_det_event_log(out_dir: str, docs_path: str, *, rounds: int = 4,
                        table: str = "docs") -> dict:
    """Deterministic, SQL-EXPRESSIBLE change log derived from a documents
    parquet table whose ``doc_id`` is a dense int64 0..n-1 (the driver's
    testdata shape).  Unlike :func:`write_event_log` (seeded RNG), every
    value here is pure integer arithmetic over ``doc_id``, so a DuckDB
    oracle can regenerate the event set verbatim from the ``documents``
    view and verify engine output HASH-EXACTLY (driver correctness gate).
    The mirrored SQL lives in ``__ray_entry__`` (``_det_cte``); keep the
    two in lock-step.

    Rule (i = round, d = doc_id, n = row count):
      seq 1                      CREATE_TABLE (own segment — DDL barrier)
      round 0 (one segment)      INSERT every doc, seq = d + 2
      round i>=1 (one segment)   event for d iff (d*7 + i*13) % 3 != 0;
                                 op = DELETE iff (d*37 + i*101) % 10 < 2
                                 else UPDATE; seq = i*n + d + 2
      payload                    lang/source copied from the doc row;
                                 n_tok = (d*131 + i*17) % 480 + 1;
                                 tokens = [0..n_tok) (length == n_tok);
                                 DELETE rows carry null payload
      timestamps                 ingest_ts = source_ts = EPOCH + seq ms

    One segment per round means the chunk planner (splits only at segment
    boundaries) makes one committed anchor per round under
    ``chunk_max_events=1`` — every anchor seq is itself SQL-computable
    (``max(seq) where round <= k``).  Mock-source analog of the reference
    test harness (MockEventReader.java:35-83) with the randomness removed.
    """
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(docs_path, columns=["doc_id", "lang", "source"])
    docs = docs.sort_by("doc_id")
    n = docs.num_rows
    d = docs["doc_id"].to_numpy()
    if n == 0 or d[0] != 0 or d[-1] != n - 1:
        raise ValueError("write_det_event_log requires dense doc_id 0..n-1")
    lang_all = docs["lang"].combine_chunks()
    src_all = docs["source"].combine_chunks()

    schema = TableSchema(table, "doc_id", [
        ("doc_id", "int64"), ("lang", "string"), ("source", "string"),
        ("n_tok", "int64"), ("tokens", "list<int32>")])
    log_schema = event_log_schema(schema)
    segments: list[dict] = []

    def write_seg(segid: int, cols: dict) -> None:
        m = len(cols["seq"])
        arrays, names = [], []
        for f in log_schema:
            names.append(f.name)
            if f.name in cols:
                a = cols[f.name]
                arrays.append(a if isinstance(a, (pa.Array, pa.ChunkedArray))
                              else pa.array(a, type=f.type))
            else:
                arrays.append(pa.nulls(m, f.type))
        tbl = pa.Table.from_arrays(arrays, names=names)
        lo, hi = int(cols["seq"][0]), int(cols["seq"][-1])
        path = os.path.join(out_dir,
                            f"events-{segid:05d}-{lo:012d}-{hi:012d}.parquet")
        pq.write_table(tbl, path, row_group_size=16384)
        segments.append({"path": path, "seq_lo": lo, "seq_hi": hi,
                         "n_rows": m, "columns": names,
                         "has_ddl": bool(cols.get("_has_ddl", False))})

    write_seg(0, {
        "seq": np.array([1], dtype=np.int64),
        "op": pa.array(["CREATE_TABLE"]),
        "table": pa.array([table]),
        "ddl_payload": pa.array([ddl_payload("CREATE_TABLE", schema=schema)]),
        "is_snapshot": pa.array([True]),
        "ingest_ts": pa.array([EPOCH_US + 1000], pa.timestamp("us")),
        "source_ts": pa.array([EPOCH_US + 1000], pa.timestamp("us")),
        "_has_ddl": True,
    })

    for i in range(rounds):
        if i == 0:
            sel = np.arange(n, dtype=np.int64)
            is_del = np.zeros(n, dtype=bool)
            ops = np.full(n, "INSERT")
        else:
            keep = (d * 7 + i * 13) % 3 != 0
            sel = d[keep]
            is_del = (sel * 37 + i * 101) % 10 < 2
            ops = np.where(is_del, "DELETE", "UPDATE")
        m = len(sel)
        seqs = i * n + sel + 2
        live = ~is_del
        n_tok = (sel * 131 + i * 17) % 480 + 1
        lens = np.where(live, n_tok, 0).astype(np.int64)
        total = int(lens.sum())
        if total > np.iinfo(np.int32).max:
            # list<int32> offsets are int32; silent cumsum wraparound
            # would corrupt the log and fail the SQL oracle with a
            # phantom engine bug — fail fast with guidance instead
            raise ValueError(
                f"round {i} holds {total} tokens, over the int32 list-"
                f"offset capacity of one segment — shard the documents "
                f"input (this deterministic log targets test scales)")
        offsets = np.zeros(m + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        vals = (np.arange(total, dtype=np.int64)
                - np.repeat(offsets[:-1], lens)).astype(np.int32)
        offsets = offsets.astype(np.int32)
        toks = pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals))
        live_pa = pa.array(live)
        idx = pa.array(sel, pa.int64())
        ts = pa.array(EPOCH_US + seqs * 1000, pa.timestamp("us"))
        write_seg(i + 1, {
            "seq": seqs,
            "op": pa.array(ops),
            "table": pa.array(np.full(m, table)),
            "doc_id": idx,
            "lang": pc.if_else(live_pa, pc.take(lang_all, idx),
                               pa.nulls(m, pa.string())),
            "source": pc.if_else(live_pa, pc.take(src_all, idx),
                                 pa.nulls(m, pa.string())),
            "n_tok": pc.if_else(live_pa, pa.array(n_tok, pa.int64()),
                                pa.nulls(m, pa.int64())),
            "tokens": pc.if_else(live_pa, toks, pa.nulls(m, toks.type))
            if m else toks,
            "ingest_ts": ts,
            "source_ts": ts,
            "is_snapshot": pa.array(np.full(m, i == 0)),
        })

    manifest = {
        "n_docs": n, "rounds": rounds, "tables": [table],
        "unordered": False, "max_seq": int(segments[-1]["seq_hi"]),
        "segments": segments,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
