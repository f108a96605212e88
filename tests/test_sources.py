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
