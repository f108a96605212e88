"""Single-process reference replayer — the executable definition of the
apply semantics the Ray engine must match row-for-row.

Mirrors the reference's worker loop (DeltaWorker.run:269-449 poll →
transform → apply) and the idempotent-apply contract
(EventConsumer.java:39-76): events are processed in arrival (seq) order;
a DML event wins over the stored row iff its version is newer — version
= seq for ORDERED sources, (source_ts, sort_key, seq) for UN_ORDERED
(ChangeEvent.java:51-60, SortKey.java:26-41).  INSERT and UPDATE both
upsert (the reference delegates to target MERGE semantics); DELETE
removes; blacklists / table filter / column whitelist / directive chains
match QueueingEventEmitter.java:96-125 + DeltaWorker.java:495-564.

Pure Python dict state — O(events); used only at test scale.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.dataset as pads

from deltaray.config import ReplayConfig
from deltaray.schemas import DDL_OPS, DML_OPS, TableSchema, apply_ddl, code_to_type
from deltaray.transforms import (
    apply_directives_to_row,
    apply_directives_to_schema,
)


def replay_oracle(cfg: ReplayConfig) -> dict[str, pa.Table]:
    """Replay the event log single-process; returns {table: final pa.Table}
    sorted by key, with the engine's user-visible schema."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(cfg.event_log, "*.parquet")))
    schemas: dict[str, TableSchema] = {}
    # table -> key -> (version tuple, row dict or None-for-tombstone)
    state: dict[str, dict[str, tuple[tuple, dict | None]]] = {}
    dropped: set[str] = set()

    for path in files:
        tbl = pads.dataset(path).to_table()
        for row in tbl.to_pylist():
            op = row["op"]
            t = row["table"]
            if op == "DROP_DATABASE":
                # flat namespace: cascade to every live table (engine
                # mirrors this); not scoped by the table-subset filter
                if "DROP_DATABASE" in cfg.ddl_blacklist_for(t):
                    continue
                for dt in list(schemas):
                    schemas = apply_ddl(schemas, dt, "DROP_TABLE", "",
                                        row["seq"])
                    dropped.add(dt)
                state.clear()
                continue
            if cfg.table_names and t not in cfg.table_names:
                continue
            if op in DDL_OPS:
                if op in cfg.ddl_blacklist_for(t):
                    continue
                if op == "TRUNCATE_TABLE":
                    state.get(t, {}).clear()
                    continue
                if op == "RENAME_TABLE":
                    d = json.loads(row.get("ddl_payload") or "{}")
                    prev = d.get("prev_table_name")
                    if prev and prev in state:
                        state[t] = state.pop(prev)
                schemas = apply_ddl(schemas, t, op, row.get("ddl_payload") or "", row["seq"])
                if op == "RENAME_COLUMN":
                    # existing rows carry over under the new column name
                    old, new = json.loads(row["ddl_payload"])["rename"]
                    for k, (ver, r) in state.get(t, {}).items():
                        if r is not None and old in r:
                            r[new] = r.pop(old)
                if op == "ALTER_TABLE":
                    d = json.loads(row.get("ddl_payload") or "{}")
                    if "drop" in d:
                        # DROP COLUMN destroys the data: a later re-ADD
                        # of the same name must read null, never the
                        # pre-drop values
                        for k, (ver, r) in state.get(t, {}).items():
                            if r is not None:
                                r.pop(d["drop"], None)
                if op == "CREATE_TABLE":
                    state.setdefault(t, {})
                    dropped.discard(t)
                if op == "DROP_TABLE":
                    state.pop(t, None)
                    dropped.add(t)
                continue
            # DML
            if t not in schemas:
                continue  # unknown-table filter
            if op in cfg.dml_blacklist_for(t):
                continue
            ts = schemas[t]
            tc = cfg.table_config(t)
            directives = tc.transformations if tc else []
            eff = apply_directives_to_schema(ts, directives)
            key_cols = eff.keys
            # column whitelist on the DDL-level schema (key always kept)
            cols = ts.column_names()
            if tc and tc.columns:
                cols = [c for c in cols if c in tc.columns or c in ts.keys]
            payload = {c: row.get(c) for c in cols}
            payload = apply_directives_to_row(payload, directives)
            if getattr(cfg, "track_previous", False):
                # before-images pass through the same directive chain
                # (reference transforms previousRow too)
                prow = apply_directives_to_row(
                    {"tokens": row.get("prev_tokens")}, directives)
                pname = eff.renames.get("tokens", "tokens")
                payload["prev_tokens"] = prow.get(pname,
                                                 row.get("prev_tokens"))
            # composite keys: state keyed by the component tuple; any null
            # component skips the row (engine mirrors this)
            key = tuple(payload.get(k) for k in key_cols)
            if any(v is None for v in key):
                continue
            n_sk = max(1, int(getattr(cfg, "sort_key_components", 2)))
            if cfg.ordering == "UN_ORDERED":
                sk = row.get("sort_keys") or []
                comps = tuple(sk[i] if len(sk) > i else 0 for i in range(n_sk))
                version = (row.get("source_ts") or 0, *comps, row["seq"])
            else:
                version = (0,) * (n_sk + 1) + (row["seq"],)
            cur = state[t].get(key)
            if cur is not None and cur[0] >= version:
                continue  # older than stored version: no-op
            if op == "DELETE":
                state[t][key] = (version, None)
            else:
                state[t][key] = (version, payload)

    out: dict[str, pa.Table] = {}
    for t, rows in state.items():
        if t in dropped:
            continue
        ts = schemas[t]
        tc = cfg.table_config(t)
        eff = apply_directives_to_schema(ts, tc.transformations if tc else [])
        live = [r for _, r in sorted(
            ((k, v[1]) for k, v in rows.items() if v[1] is not None),
            key=lambda kv: kv[0],
        )]
        cols = {}
        for name, codec in eff.fields:
            cols[name] = pa.array(
                [r.get(name) for r in live], type=code_to_type(codec)
            )
        if getattr(cfg, "track_previous", False):
            cols["prev_tokens"] = pa.array(
                [r.get("prev_tokens") for r in live], pa.list_(pa.int32()))
        out[t] = pa.table(cols)
    return out


def tables_equal(a: pa.Table, b: pa.Table, key: str = "doc_id") -> tuple[bool, str]:
    """Row-for-row equality with token-array equality per key (input_hint's
    per-row invariant).  Returns (ok, message)."""
    if sorted(a.column_names) != sorted(b.column_names):
        return False, f"columns differ: {a.column_names} vs {b.column_names}"
    if a.num_rows != b.num_rows:
        return False, f"row counts differ: {a.num_rows} vs {b.num_rows}"
    a = a.sort_by(key).select(sorted(a.column_names))
    b = b.sort_by(key).select(sorted(b.column_names))
    for col in a.column_names:
        ca, cb = a[col], b[col]
        if ca.type != cb.type:
            return False, f"{col}: type {ca.type} vs {cb.type}"
        if not ca.equals(cb):
            # locate first mismatch for the error message
            la, lb = ca.to_pylist(), cb.to_pylist()
            for i, (x, y) in enumerate(zip(la, lb)):
                if x != y:
                    k = a[key][i].as_py()
                    return False, f"{col} differs at {key}={k}: {x!r} vs {y!r}"
            return False, f"{col} differs"
    return True, "equal"
