"""Source/sink adapter tests: JSONL normalization round-trip + export."""

import glob
import json
import os

import pyarrow.parquet as pq

from deltaray import ReplayConfig, replay, replay_oracle
from deltaray.gen import write_event_log
from deltaray.oracle import tables_equal
from deltaray.pipeline import read_table
from deltaray.schemas import default_table_schema
from deltaray.sources import export_table, normalize_jsonl_log


def _parquet_log_to_jsonl(parquet_dir: str, jsonl_dir: str, shards: int = 3):
    os.makedirs(jsonl_dir, exist_ok=True)
    rows = []
    for p in sorted(glob.glob(os.path.join(parquet_dir, "*.parquet"))):
        rows.extend(pq.read_table(p).to_pylist())
    # scatter rows across shards UNSORTED to prove normalization reorders
    files = [open(os.path.join(jsonl_dir, f"shard-{i}.jsonl"), "w")
             for i in range(shards)]
    for i, r in enumerate(reversed(rows)):
        r = {k: v for k, v in r.items() if v is not None}
        if "ingest_ts" in r:
            r["ingest_ts"] = str(r["ingest_ts"])
        if "source_ts" in r:
            r["source_ts"] = str(r["source_ts"])
        files[i % shards].write(json.dumps(r) + "\n")
    for f in files:
        f.close()


def test_jsonl_source_roundtrip(tmp_path):
    raw = str(tmp_path / "raw")
    jsonl = str(tmp_path / "jsonl")
    norm = str(tmp_path / "norm")
    lake = str(tmp_path / "lake")
    write_event_log(raw, n_docs=120, n_events=900, seed=51)
    _parquet_log_to_jsonl(raw, jsonl)
    m = normalize_jsonl_log(jsonl, norm, default_table_schema(),
                            segment_max_events=400)
    assert len(m["segments"]) >= 2
    # seq ranges are tight and non-overlapping
    prev_hi = 0
    for s in m["segments"]:
        assert s["seq_lo"] > prev_hi
        prev_hi = s["seq_hi"]
    cfg = ReplayConfig(event_log=norm, lake=lake, num_partitions=4)
    replay(cfg)
    # oracle runs on the ORIGINAL parquet log — same semantics
    ocfg = ReplayConfig(event_log=raw, lake=lake + "-x", num_partitions=4)
    ok, msg = tables_equal(read_table(lake, "docs"), replay_oracle(ocfg)["docs"])
    assert ok, msg


def test_export_table(tmp_path):
    raw = str(tmp_path / "raw")
    lake = str(tmp_path / "lake")
    write_event_log(raw, n_docs=80, n_events=300, seed=53)
    cfg = ReplayConfig(event_log=raw, lake=lake, num_partitions=2)
    replay(cfg)
    dest = export_table(lake, "docs", str(tmp_path / "out"))
    import ray.data

    got = ray.data.read_parquet(dest)
    assert got.count() == read_table(lake, "docs").num_rows


def _parquet_log_to_csv(parquet_dir: str, csv_dir: str, shards: int = 3):
    import csv

    os.makedirs(csv_dir, exist_ok=True)
    rows = []
    for p in sorted(glob.glob(os.path.join(parquet_dir, "*.parquet"))):
        rows.extend(pq.read_table(p).to_pylist())
    cols = list(rows[0].keys())
    writers = []
    for i in range(shards):
        f = open(os.path.join(csv_dir, f"shard-{i}.csv"), "w", newline="")
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        writers.append((f, w))
    for i, r in enumerate(reversed(rows)):  # unsorted on purpose
        r = dict(r)
        for c in ("tokens", "prev_tokens"):
            if r.get(c) is not None:
                r[c] = json.dumps(r[c])  # lists ride as JSON strings
        for c in ("ingest_ts", "source_ts"):
            if r.get(c) is not None:
                r[c] = str(r[c])
        writers[i % shards][1].writerow(r)
    for f, _ in writers:
        f.close()


def test_csv_source_roundtrip(tmp_path):
    from deltaray.sources import normalize_csv_log

    raw = str(tmp_path / "raw")
    csvd = str(tmp_path / "csv")
    norm = str(tmp_path / "norm")
    lake = str(tmp_path / "lake")
    write_event_log(raw, n_docs=80, n_events=600, seed=52)
    _parquet_log_to_csv(raw, csvd)
    m = normalize_csv_log(csvd, norm, default_table_schema(),
                          segment_max_events=300)
    assert len(m["segments"]) >= 2
    cfg = ReplayConfig(event_log=norm, lake=lake, num_partitions=4)
    replay(cfg)
    oracle_cfg = ReplayConfig(event_log=raw, lake=lake + "_o", num_partitions=4)
    ok, msg = tables_equal(read_table(lake, "docs"),
                           replay_oracle(oracle_cfg)["docs"])
    assert ok, msg


def test_normalize_parquet_log(tmp_path, tmp_lake, ray_session):
    """Foreign parquet shards with source-native column names normalize
    into the engine log via column_map and replay correctly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deltaray import ReplayConfig, replay, replay_oracle, read_table
    from deltaray.oracle import tables_equal
    from deltaray.schemas import ddl_payload, default_table_schema
    from deltaray.sources import normalize_parquet_log

    src = tmp_path / "foreign"
    src.mkdir()
    schema = default_table_schema()
    rows = [{"sequence": 1, "operation": "CREATE_TABLE", "table": "docs",
             "ddl_payload": ddl_payload("CREATE_TABLE", schema=schema)}]
    import numpy as np
    rng = np.random.default_rng(3)
    for i in range(200):
        op = ("INSERT", "UPDATE", "DELETE")[int(rng.integers(0, 3))]
        r = {"sequence": i + 2, "operation": op, "table": "docs",
             "doc_id": f"docs-doc{int(rng.integers(0, 40)):08d}"}
        if op != "DELETE":
            r.update(tokens=[int(x) for x in rng.integers(0, 99, 4)],
                     n_tok=4, source="web")
        rows.append(r)
    # two unsorted shards
    half = len(rows) // 2
    for i, chunk in enumerate([rows[half:], rows[:half]]):
        cols = {}
        for k in ("sequence", "operation", "table", "doc_id", "tokens",
                  "n_tok", "source", "ddl_payload"):
            cols[k] = [r.get(k) for r in chunk]
        t = pa.table({
            "sequence": pa.array(cols["sequence"], pa.int64()),
            "operation": pa.array(cols["operation"]),
            "table": pa.array(cols["table"]),
            "doc_id": pa.array(cols["doc_id"]),
            "tokens": pa.array(cols["tokens"], pa.list_(pa.int32())),
            "n_tok": pa.array(cols["n_tok"], pa.int32()),
            "source": pa.array(cols["source"]),
            "ddl_payload": pa.array(cols["ddl_payload"]),
        })
        pq.write_table(t, src / f"shard-{i}.parquet")

    out = tmp_path / "log"
    m = normalize_parquet_log(str(src), str(out), schema,
                              segment_max_events=80,
                              column_map={"sequence": "seq",
                                          "operation": "op"})
    assert m["max_seq"] == len(rows)
    cfg = ReplayConfig(event_log=str(out), lake=tmp_lake, num_partitions=2)
    replay(cfg)
    ok, msg = tables_equal(read_table(tmp_lake, "docs"),
                           replay_oracle(cfg)["docs"])
    assert ok, msg


def test_export_with_previous(tmp_path, tmp_log, tmp_lake, ray_session):
    import glob

    import pyarrow.parquet as pq

    from deltaray import ReplayConfig, replay
    from deltaray.gen import write_event_log
    from deltaray.sources import export_table

    write_event_log(tmp_log, n_docs=40, n_events=400, seed=111,
                    track_prev=True)
    cfg = ReplayConfig(event_log=tmp_log, lake=tmp_lake, num_partitions=2,
                       track_previous=True)
    replay(cfg)
    dest = str(tmp_path / "audit")
    export_table(tmp_lake, "docs", dest, with_previous=True)
    files = glob.glob(dest + "/*.parquet")
    assert files
    t = pq.read_table(files[0])
    assert "prev_tokens" in t.column_names


def test_normalize_assume_sorted_skips_global_sort(tmp_path, tmp_lake,
                                                   ray_session):
    """Pre-ordered shards normalize without the all-to-all sort and replay
    to the same state; mis-declared ordering stays CORRECT (seq filtering
    at read) — only pruning gets looser."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deltaray import ReplayConfig, replay, replay_oracle, read_table
    from deltaray.oracle import tables_equal
    from deltaray.schemas import (ddl_payload, default_table_schema,
                                  event_log_schema)
    from deltaray.sources import normalize_parquet_log

    schema = default_table_schema()
    log_schema = event_log_schema(schema)
    rng = np.random.default_rng(5)
    rows = [{"seq": 1, "op": "CREATE_TABLE", "table": "docs",
             "ddl_payload": ddl_payload("CREATE_TABLE", schema=schema)}]
    for i in range(300):
        op = ("INSERT", "UPDATE", "DELETE")[int(rng.integers(0, 3))]
        r = {"seq": i + 2, "op": op, "table": "docs",
             "doc_id": f"docs-doc{int(rng.integers(0, 50)):08d}"}
        if op != "DELETE":
            r.update(tokens=[1, 2], n_tok=2, source="web")
        rows.append(r)
    src = tmp_path / "ordered"
    src.mkdir()
    third = len(rows) // 3
    for i, chunk in enumerate([rows[:third], rows[third:2 * third],
                               rows[2 * third:]]):  # ordered disjoint shards
        cols = {f.name: [r.get(f.name) for r in chunk] for f in log_schema}
        pq.write_table(pa.table(cols, schema=log_schema),
                       src / f"shard-{i}.parquet")
    out = tmp_path / "log"
    m = normalize_parquet_log(str(src), str(out), schema,
                              segment_max_events=120, assume_sorted=True)
    los = [s["seq_lo"] for s in m["segments"]]
    assert los == sorted(los)
    cfg = ReplayConfig(event_log=str(out), lake=tmp_lake, num_partitions=2)
    replay(cfg)
    ok, msg = tables_equal(read_table(tmp_lake, "docs"),
                           replay_oracle(cfg)["docs"])
    assert ok, msg


def test_normalize_local_sort_overlapping_segments(tmp_path, ray_session):
    """local_sort normalization writes segments with OVERLAPPING seq
    ranges (no global sort, zero shuffle); replay still equals the
    oracle because every read filters by seq range — chunk boundaries
    bisecting a segment read it from both sides with disjoint filters."""
    raw = str(tmp_path / "raw")
    jsonl = str(tmp_path / "jsonl")
    norm = str(tmp_path / "norm")
    lake = str(tmp_path / "lake")
    write_event_log(raw, n_docs=120, n_events=1200, seed=52)
    # round-robin scatter → every shard spans nearly the full seq range
    _parquet_log_to_jsonl(raw, jsonl)
    m = normalize_jsonl_log(jsonl, norm, default_table_schema(),
                            segment_max_events=300, local_sort=True)
    segs = sorted(m["segments"], key=lambda s: s["seq_lo"])
    assert len(segs) >= 2
    overlaps = any(a["seq_hi"] >= b["seq_lo"]
                   for a, b in zip(segs, segs[1:]))
    assert overlaps, "round-robin shards should yield overlapping segments"
    # rows are seq-sorted WITHIN each segment (row-group pruning intact)
    t0 = pq.read_table(segs[0]["path"], columns=["seq"])
    s0 = t0["seq"].to_numpy()
    assert (s0[1:] >= s0[:-1]).all()
    cfg = ReplayConfig(event_log=norm, lake=lake, num_partitions=4,
                       chunk_max_events=400)
    replay(cfg)
    ocfg = ReplayConfig(event_log=raw, lake=lake + "-x", num_partitions=4)
    ok, msg = tables_equal(read_table(lake, "docs"),
                           replay_oracle(ocfg)["docs"])
    assert ok, msg
