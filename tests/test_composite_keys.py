"""Composite primary keys end-to-end (reference: DDLEvent.java:31-55
primaryKey is List<String>; exercised by the state-store base tests'
multi-column schemas).  The engine must replicate a table keyed by
(k1, k2): shard by the composite hash, LWW per key tuple, upsert by
version against the lake base, and skip rows with any null component."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from deltaray import ReplayConfig, replay, replay_oracle
from deltaray.oracle import tables_equal
from deltaray.pipeline import read_table
from deltaray.schemas import TableSchema, ddl_payload, event_log_schema

PAIRS = TableSchema(
    "pairs", ["k1", "k2"],
    [("k1", "string"), ("k2", "int64"), ("v", "int64")],
)


def _write_composite_log(out_dir: str, *, n_events: int = 600, seed: int = 7,
                         with_null_keys: bool = True) -> None:
    log_schema = event_log_schema(PAIRS)
    rng = np.random.default_rng(seed)
    rows = [{
        "seq": 1, "op": "CREATE_TABLE", "table": "pairs",
        "ddl_payload": ddl_payload("CREATE_TABLE", schema=PAIRS),
        "is_snapshot": True,
    }]
    seq = 1
    for i in range(n_events):
        seq += 1
        op = ("INSERT", "UPDATE", "DELETE")[int(rng.integers(0, 3))]
        row = {
            "seq": seq, "op": op, "table": "pairs",
            "k1": f"g{int(rng.integers(0, 6))}",
            "k2": int(rng.integers(0, 25)),
            "is_snapshot": False,
        }
        if op != "DELETE":
            row["v"] = int(rng.integers(0, 1000))
        if with_null_keys and i % 97 == 0:
            row["k2"] = None  # null component: both sides must skip it
        rows.append(row)
    tbl = pa.table(
        {f.name: [r.get(f.name) for r in rows] for f in log_schema},
        schema=log_schema,
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        tbl, os.path.join(out_dir, f"events-00000-{1:012d}-{seq:012d}.parquet"),
        row_group_size=128,
    )


def _sorted_pair(t: pa.Table) -> pa.Table:
    return t.sort_by([("k1", "ascending"), ("k2", "ascending")])


def test_composite_key_replay_equals_oracle(tmp_log, tmp_lake):
    _write_composite_log(tmp_log)
    cfg = ReplayConfig(event_log=tmp_log, lake=tmp_lake, num_partitions=4,
                       chunk_max_events=150)
    replay(cfg)
    oracle = replay_oracle(cfg)["pairs"]
    got = read_table(tmp_lake, "pairs")
    ok, msg = tables_equal(_sorted_pair(got), _sorted_pair(oracle), key="k1")
    assert ok, msg
    assert got.num_rows > 0
    # per-tuple uniqueness: no duplicate composite keys in the lake
    uniq = {(a, b) for a, b in zip(got["k1"].to_pylist(),
                                   got["k2"].to_pylist())}
    assert len(uniq) == got.num_rows
    # idempotent re-replay
    replay(cfg)
    got2 = read_table(tmp_lake, "pairs")
    ok, msg = tables_equal(_sorted_pair(got2), _sorted_pair(oracle), key="k1")
    assert ok, msg


def test_composite_key_pk_rename_remap(tmp_log, tmp_lake):
    """RENAME_COLUMN of one composite component remaps that component in
    the key list (TransformationUtil.transformDDLEvent:121-132)."""
    s2 = PAIRS.with_renamed_column("k2", "k2x", 5)
    assert s2.keys == ["k1", "k2x"]
    s3 = s2.with_renamed_column("k1", "kA", 6)
    assert s3.keys == ["kA", "k2x"]


def test_row_id_keyed_table(tmp_log, tmp_lake):
    """rowId-keyed mode (SourceProperties.rowIdSupported +
    DMLEvent.rowId, SourceProperties.java:24-51 / DMLEvent.java:78-85):
    a table with NO declared primary key replicates keyed by the opaque
    per-row ``row_id`` the source supplies."""
    ts = TableSchema("audit", None, [("v", "int64"), ("tag", "string")])
    assert ts.keys == ["row_id"]
    assert ts.column_names()[0] == "row_id"  # implicit key column added
    log_schema = event_log_schema(ts)
    rng = np.random.default_rng(13)
    rows = [{
        "seq": 1, "op": "CREATE_TABLE", "table": "audit",
        "ddl_payload": ddl_payload("CREATE_TABLE", schema=ts),
        "is_snapshot": True,
    }]
    seq = 1
    for i in range(500):
        seq += 1
        op = ("INSERT", "UPDATE", "DELETE")[int(rng.integers(0, 3))]
        row = {"seq": seq, "op": op, "table": "audit",
               "row_id": f"r{int(rng.integers(0, 60)):04d}",
               "is_snapshot": False}
        if op != "DELETE":
            row["v"] = int(rng.integers(0, 100))
            row["tag"] = f"t{int(rng.integers(0, 4))}"
        rows.append(row)
    tbl = pa.table({f.name: [r.get(f.name) for r in rows] for f in log_schema},
                   schema=log_schema)
    os.makedirs(tmp_log, exist_ok=True)
    pq.write_table(tbl, os.path.join(
        tmp_log, f"events-00000-{1:012d}-{seq:012d}.parquet"),
        row_group_size=128)
    cfg = ReplayConfig(event_log=tmp_log, lake=tmp_lake, num_partitions=4,
                       chunk_max_events=120)
    replay(cfg)
    oracle = replay_oracle(cfg)["audit"]
    got = read_table(tmp_lake, "audit")
    ok, msg = tables_equal(got, oracle, key="row_id")
    assert ok, msg
    assert got.num_rows > 0
    assert len(set(got["row_id"].to_pylist())) == got.num_rows


def test_rename_table_mid_stream(tmp_log, tmp_lake):
    """RENAME_TABLE: the lake directory moves, the schema registry rekeys,
    and post-rename DML lands in the renamed table — equal to the oracle,
    resumable (re-applied DDL is a no-op)."""
    from deltaray.schemas import default_table_schema

    schema = default_table_schema("docs")
    log_schema = event_log_schema(schema)

    def tok(i):
        return [i, i + 1]

    rows = [
        {"seq": 1, "op": "CREATE_TABLE", "table": "docs",
         "ddl_payload": ddl_payload("CREATE_TABLE", schema=schema),
         "is_snapshot": True},
    ]
    seq = 1
    for i in range(6):
        seq += 1
        rows.append({"seq": seq, "op": "INSERT", "table": "docs",
                     "doc_id": f"d{i}", "tokens": tok(i), "n_tok": 2,
                     "source": "web", "is_snapshot": True})
    seq += 1
    rows.append({"seq": seq, "op": "RENAME_TABLE", "table": "docs2",
                 "ddl_payload": ddl_payload("RENAME_TABLE",
                                            prev_table_name="docs")})
    for i, (op, doc) in enumerate([("UPDATE", "d2"), ("DELETE", "d0"),
                                   ("INSERT", "d9")]):
        seq += 1
        r = {"seq": seq, "op": op, "table": "docs2", "doc_id": doc,
             "is_snapshot": False}
        if op != "DELETE":
            r.update(tokens=tok(40 + i), n_tok=2, source="code")
        rows.append(r)
    os.makedirs(tmp_log, exist_ok=True)
    # split across segments so the rename is a real chunk barrier
    cut = 5
    for name, seg in [(f"events-00000-{1:012d}-{cut:012d}", rows[:cut]),
                      (f"events-00001-{cut+1:012d}-{seq:012d}", rows[cut:])]:
        cols = {f.name: [r.get(f.name) for r in seg] for f in log_schema}
        pq.write_table(pa.table(cols, schema=log_schema),
                       os.path.join(tmp_log, name + ".parquet"))
    cfg = ReplayConfig(event_log=tmp_log, lake=tmp_lake, num_partitions=2,
                       chunk_max_events=3)
    replay(cfg)
    oracle = replay_oracle(cfg)
    assert "docs2" in oracle and "docs" not in oracle
    got = read_table(tmp_lake, "docs2")
    ok, msg = tables_equal(got, oracle["docs2"])
    assert ok, msg
    by_id = {r["doc_id"]: r["tokens"] for r in got.to_pylist()}
    assert "d0" not in by_id and by_id["d2"] == tok(40) and "d9" in by_id
    # resume: rename already applied, still equal
    replay(cfg)
    got2 = read_table(tmp_lake, "docs2")
    ok, msg = tables_equal(got2, oracle["docs2"])
    assert ok, msg


def test_rename_table_moves_lineage(tmp_log, tmp_lake):
    """Lineage records follow a RENAME_TABLE (they live outside the table
    directory); DROP_DATABASE is blacklisted by default (DeltaConfig
    default blacklist semantics) and leaves state untouched."""
    from deltaray.pipeline import lineage_report
    from deltaray.schemas import default_table_schema

    schema = default_table_schema("docs")
    log_schema = event_log_schema(schema)
    rows = [{"seq": 1, "op": "CREATE_TABLE", "table": "docs",
             "ddl_payload": ddl_payload("CREATE_TABLE", schema=schema),
             "is_snapshot": True}]
    for i in range(4):
        rows.append({"seq": 2 + i, "op": "INSERT", "table": "docs",
                     "doc_id": f"d{i}", "tokens": [i], "n_tok": 1,
                     "source": "web", "is_snapshot": True})
    rows.append({"seq": 6, "op": "DROP_DATABASE", "table": "docs",
                 "ddl_payload": ddl_payload("DROP_DATABASE")})
    rows.append({"seq": 7, "op": "RENAME_TABLE", "table": "renamed",
                 "ddl_payload": ddl_payload("RENAME_TABLE",
                                            prev_table_name="docs")})
    rows.append({"seq": 8, "op": "UPDATE", "table": "renamed",
                 "doc_id": "d1", "tokens": [99], "n_tok": 1,
                 "source": "web", "is_snapshot": False})
    os.makedirs(tmp_log, exist_ok=True)
    for name, seg in [(f"events-00000-{1:012d}-{5:012d}", rows[:5]),
                      (f"events-00001-{6:012d}-{8:012d}", rows[5:])]:
        cols = {f.name: [r.get(f.name) for r in seg] for f in log_schema}
        pq.write_table(pa.table(cols, schema=log_schema),
                       os.path.join(tmp_log, name + ".parquet"))
    cfg = ReplayConfig(event_log=tmp_log, lake=tmp_lake, num_partitions=2,
                       chunk_max_events=3)
    replay(cfg)
    oracle = replay_oracle(cfg)
    got = read_table(tmp_lake, "renamed")
    ok, msg = tables_equal(got, oracle["renamed"])
    assert ok, msg
    assert got.num_rows == 4  # DROP_DATABASE was blacklisted away
    rep = lineage_report(tmp_lake)
    assert "renamed" in rep["tables"] and "docs" not in rep["tables"]
