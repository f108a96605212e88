"""Round-5 composition probes (the round-4 program found 3 real bugs;
VERDICT r4 'Next #5' names the untested pairs these cover):

- ingest gates x lake reshard (the gate index lives OUTSIDE the lake's
  generation story: membership must survive a generation migration and
  reject the re-exported corpus wholesale)
- ingest gate epoch retry AFTER the index compacted beneath it
- manifest rollup x reshard (a manifest-compacted commit log is the
  reshard SOURCE; the copied chunk markers include rolled-up manifests)
- replication chaining x schema evolution (DDL does not chain —
  documented; probe that a pull window crossing upstream DDL behaves
  cleanly when the operator applies the DDL downstream first, and that
  the pull itself carries the as-of schema)
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from deltaray import (ReplayConfig, feed_to_events, read_changes,
                      read_table, replay, replay_oracle, reshard_generation,
                      snapshots, tables_equal)
from deltaray.gen import write_event_log
from deltaray.pipeline import bootstrap_table, read_table_ds
from deltaray.schemas import TableSchema, default_table_schema
from deltaray.util import to_table


def _corpus_ds(texts, ids=None):
    import ray.data

    ids = ids if ids is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i:06d}" for i in ids]),
        "text": pa.array(texts)})).repartition(3)


def test_ingest_gate_across_lake_reshard(ray_session, tmp_path):
    """Gate epoch 0 admits a lake's corpus; the lake is then resharded
    into a new generation and the corpus RE-EXPORTED (same rows, new
    partitioning) plus a handful of new docs.  Epoch 1 must admit
    exactly the new docs: gate membership is independent of the lake's
    generation/partitioning story."""
    import ray.data

    from deltaray.functions.ingest_gate import ExactIngestGate

    texts = [f"gate-reshard body {i} {'x' * (i % 7)}" for i in range(90)]
    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(event_log=str(tmp_path / "ev"), lake=lake,
                       num_partitions=4)
    schema = TableSchema("docs", "doc_id",
                         [("doc_id", "string"), ("text", "string")])
    bootstrap_table(cfg, schema, _corpus_ds(texts))

    gate = ExactIngestGate(str(tmp_path / "idx"), num_partitions=4,
                           compact_threshold=2)
    a0 = to_table(gate.admit(read_table_ds(lake, "docs"), 0))
    assert a0.num_rows == len(texts)

    res = reshard_generation(lake, 7)
    gen = res["generation"]
    new = [f"post-reshard new doc {i}" for i in range(5)]
    re_export = read_table_ds(lake, "docs", generation=gen).union(
        _corpus_ds(new, ids=range(1000, 1005)))
    a1 = to_table(gate.admit(re_export, 1))
    assert sorted(a1["text"].to_pylist()) == sorted(new), (
        f"gate re-admitted old corpus rows after reshard: "
        f"{a1.num_rows} admitted")


def test_ingest_gate_epoch_retry_after_compaction(ray_session, tmp_path):
    """Replaying an ALREADY-ADMITTED epoch after the index compacted its
    files into sorted runs returns the same rows and writes nothing —
    the write-once epoch contract must hold against the post-compaction
    layout, not just loose epoch files."""
    import glob

    from deltaray.functions.ingest_gate import ExactIngestGate

    gate = ExactIngestGate(str(tmp_path / "idx"), num_partitions=2,
                           compact_threshold=2)
    admitted = {}
    for e in range(6):  # threshold 2 -> several compactions
        texts = [f"epoch {e} doc {i}" for i in range(10)] \
            + ([f"epoch {e - 1} doc 3"] if e else [])  # one dup each
        admitted[e] = to_table(
            gate.admit(_corpus_ds(texts, ids=range(e * 100,
                                                   e * 100 + len(texts))),
                       e))
        # 10 new docs admitted; the cross-epoch dup rejected
        assert admitted[e].num_rows == 10
    files_before = sorted(glob.glob(str(tmp_path / "idx/**/*"),
                                    recursive=True))
    retry = to_table(gate.admit(
        _corpus_ds([f"epoch 5 doc {i}" for i in range(10)]
                   + ["epoch 4 doc 3"],
                   ids=range(500, 511)), 5))
    files_after = sorted(glob.glob(str(tmp_path / "idx/**/*"),
                                   recursive=True))
    assert files_before == files_after, "epoch retry wrote index files"
    assert sorted(retry["text"].to_pylist()) == sorted(
        admitted[5]["text"].to_pylist())


def test_manifest_rollup_then_reshard(ray_session, tmp_path):
    """Reshard a lake whose commit records AND chunk markers are rolled
    into manifests: the new generation must carry the full commit
    history (copied chunk manifests skip the prefix on tail replay) and
    the final state must equal the single-process oracle."""
    log, lake = str(tmp_path / "ev"), str(tmp_path / "lake")
    man = write_event_log(log, n_docs=80, n_events=800, seed=31,
                          track_prev=False, segment_max_events=200)
    head = man["segments"][: len(man["segments"]) // 2]
    import json as _json
    import shutil as _sh

    half = str(tmp_path / "ev_head")
    os.makedirs(half)
    for s in head:
        _sh.copy(s["path"], half)
    cut = max(s["seq_hi"] for s in head)
    with open(os.path.join(half, "manifest.json"), "w") as f:
        _json.dump(dict(man, max_seq=cut, segments=[
            dict(s, path=os.path.join(half, os.path.basename(s["path"])))
            for s in head]), f)
    kw = dict(num_partitions=4, chunk_max_events=100, manifest_every=1)
    replay(ReplayConfig(event_log=half, lake=lake, **kw))
    # rollup really happened: no loose markers/commits remain un-rolled
    import glob

    assert glob.glob(os.path.join(lake, "gen=0000", "_chunks",
                                  "chunks-manifest-*.json"))
    assert glob.glob(os.path.join(lake, "gen=0000", "docs", "_commits",
                                  "part=*", "manifest-*.json"))

    pre = read_table(lake, "docs")
    res = reshard_generation(lake, 5)
    gen = res["generation"]
    ok, msg = tables_equal(read_table(lake, "docs", generation=gen), pre)
    assert ok, msg

    ran = []
    full_cfg = ReplayConfig(event_log=log, lake=lake, num_partitions=5,
                            generation=gen, chunk_max_events=100,
                            manifest_every=1)
    replay(full_cfg, on_chunk=lambda i, c, rows: ran.append(c.seq_hi))
    assert all(hi > cut for hi in ran), "copied manifests failed to skip"
    ok, msg = tables_equal(read_table(lake, "docs", generation=gen),
                           replay_oracle(full_cfg)["docs"])
    assert ok, msg


def test_chaining_across_upstream_ddl(ray_session, tmp_path):
    """Chaining x schema evolution: upstream ALTERs (adds a column)
    mid-log.  DDL does not chain (documented), so the operator applies
    the DDL downstream between pulls; each pull is emitted under its
    as-of schema and the mirror stays exact through the evolution —
    including the new column's values."""
    import ray.data as rd

    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    write_event_log(log_a, n_docs=60, n_events=900, seed=77,
                    segment_max_events=150, track_prev=False,
                    ddl=[(450, "docs", "ALTER_TABLE",
                          {"add": ("tag", "string"),
                           "choices": ["p", "q"]})])
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=4,
                        chunk_max_events=150, vacuum=False))
    snaps = snapshots(lake_a)
    from deltaray.pipeline import _schema_asof
    from deltaray.commit import LakeState

    st_a = LakeState(lake_a, 0)
    # anchors strictly before/after the ALTER, by schema width
    pre_ddl = [s for s in snaps
               if "tag" not in _schema_asof(st_a, "docs", s).column_names()]
    post_ddl = [s for s in snaps if s not in pre_ddl]
    assert pre_ddl and post_ddl
    s0, s1, s2 = pre_ddl[0], pre_ddl[-1], post_ddl[-1]

    schema0 = _schema_asof(st_a, "docs", s0)
    cfg_b = ReplayConfig(event_log=log_b, lake=lake_b, num_partitions=3,
                         chunk_max_events=10**9, vacuum=False)
    bootstrap_table(cfg_b, schema0,
                    rd.from_arrow(read_table(lake_a, "docs", asof_seq=s0)),
                    snapshot_seq=s0)

    # pull 1: window entirely before the DDL — old schema
    feed1 = to_table(read_changes(lake_a, "docs", since_seq=s0,
                                  as_of_seq=s1))
    assert "tag" not in feed1.column_names
    _append(log_b, feed_to_events(feed1, schema0), 0)
    replay(cfg_b)
    ok, msg = tables_equal(read_table(lake_b, "docs"),
                           read_table(lake_a, "docs", asof_seq=s1))
    assert ok, msg

    # operator applies the DDL downstream (the documented manual step),
    # as a DDL event in B's own log at a seq inside the next window
    schema1 = _schema_asof(st_a, "docs", s2)
    assert "tag" in schema1.column_names()
    from deltaray.schemas import ddl_payload, event_log_schema

    dseq = s1 + 1
    ddl_row = {"seq": dseq, "op": "ALTER_TABLE", "table": "docs",
               "ddl_payload": ddl_payload("ALTER_TABLE",
                                          add=("tag", "string"))}
    cols = {n: [ddl_row.get(n)] for n in
            event_log_schema(schema0).names}
    pq.write_table(pa.table(cols, schema=event_log_schema(schema0)),
                   os.path.join(log_b, f"events-99990-{dseq:012d}-"
                                       f"{dseq:012d}.parquet"))

    # pull 2: window crossing the upstream DDL — as-of schema carries
    # the new column; mirror must match including its values
    feed2 = to_table(read_changes(lake_a, "docs", since_seq=s1,
                                  as_of_seq=s2))
    assert "tag" in feed2.column_names
    _append(log_b, feed_to_events(feed2, schema1), 1)
    replay(cfg_b)
    ok, msg = tables_equal(read_table(lake_b, "docs"),
                           read_table(lake_a, "docs", asof_seq=s2))
    assert ok, msg


def _append(log: str, ev: pa.Table, n: int) -> None:
    lo = ev["seq"][0].as_py()
    hi = ev["seq"][-1].as_py()
    os.makedirs(log, exist_ok=True)
    pq.write_table(ev, os.path.join(
        log, f"events-{n:05d}-{lo:012d}-{hi:012d}.parquet"))


def test_multitable_promotion_with_ddl_interleave(ray_session, tmp_path):
    """Multi-table DDL interleaving under cross-table type promotion:
    tables `a` (v:int32) and `b` (v:int64) co-replay — the shared
    column transports at the promoted width — then a mid-stream ALTER
    widens a.v to int64 and both tables keep ingesting.  Final state of
    BOTH tables must equal the single-process oracle, with b carrying
    beyond-int32 values throughout and a carrying them only after its
    ALTER."""
    import json as _json

    from deltaray import ReplayConfig, replay, replay_oracle, tables_equal
    from deltaray.pipeline import read_table
    from deltaray.schemas import TableSchema, ddl_payload

    sch_a = TableSchema("a", "k", [("k", "int64"), ("v", "int32"),
                                   ("s", "string")])
    sch_b = TableSchema("b", "k", [("k", "int64"), ("v", "int64")])
    # transport schema: the union with v at the PROMOTED width
    log_schema = pa.schema([
        ("seq", pa.int64()), ("op", pa.string()), ("table", pa.string()),
        ("k", pa.int64()), ("v", pa.int64()), ("s", pa.string()),
        ("ingest_ts", pa.timestamp("us")), ("source_ts", pa.timestamp("us")),
        ("sort_keys", pa.list_(pa.int64())), ("is_snapshot", pa.bool_()),
        ("tx_id", pa.string()), ("ddl_payload", pa.string()),
    ])
    BIG = 5_000_000_000  # beyond int32

    rows: list[dict] = []

    def ev(op, table, seq, **kw):
        r = {"seq": seq, "op": op, "table": table,
             "ingest_ts": 1704067200_000000 + seq * 1000,
             "source_ts": 1704067200_000000 + seq * 1000,
             "is_snapshot": False, **kw}
        rows.append(r)

    ev("CREATE_TABLE", "a", 1,
       ddl_payload=ddl_payload("CREATE_TABLE", schema=sch_a),
       is_snapshot=True)
    ev("CREATE_TABLE", "b", 2,
       ddl_payload=ddl_payload("CREATE_TABLE", schema=sch_b),
       is_snapshot=True)
    seq = 3
    for i in range(12):  # interleaved DML, b uses beyond-int32 values
        ev("INSERT", "a", seq, k=i, v=i * 10, s=f"s{i}")
        seq += 1
        ev("INSERT", "b", seq, k=i, v=BIG + i)
        seq += 1
    alter_seq = seq
    ev("ALTER_TABLE", "a", seq,
       ddl_payload=ddl_payload("ALTER_TABLE", alter=("v", "int64")))
    seq += 1
    for i in range(12):  # post-ALTER: a can carry wide values too
        ev("UPDATE", "a", seq, k=i, v=BIG * 2 + i, s=f"w{i}")
        seq += 1
        ev("DELETE" if i % 3 == 0 else "UPDATE", "b", seq, k=i,
           v=None if i % 3 == 0 else BIG + 100 + i)
        seq += 1

    log = str(tmp_path / "events")
    os.makedirs(log)
    # DDL barriers: CREATEs in one segment, ALTER in its own, DML between
    def seg(sub, segid, has_ddl):
        cols = {f.name: [r.get(f.name) for r in sub] for f in log_schema}
        t = pa.table(cols, schema=log_schema)
        lo, hi = sub[0]["seq"], sub[-1]["seq"]
        pq.write_table(t, os.path.join(
            log, f"events-{segid:05d}-{lo:012d}-{hi:012d}.parquet"))
        return {"path": os.path.join(
            log, f"events-{segid:05d}-{lo:012d}-{hi:012d}.parquet"),
            "seq_lo": int(lo), "seq_hi": int(hi), "n_rows": len(sub),
            "columns": log_schema.names, "has_ddl": has_ddl}

    pre = [r for r in rows if 2 < r["seq"] < alter_seq]
    post = [r for r in rows if r["seq"] > alter_seq]
    segments = [seg(rows[:2], 0, True), seg(pre, 1, False),
                seg([rows[2 + len(pre)]], 2, True), seg(post, 3, False)]
    with open(os.path.join(log, "manifest.json"), "w") as f:
        _json.dump({"max_seq": int(rows[-1]["seq"]),
                    "segments": segments, "tables": ["a", "b"]}, f)

    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                       chunk_max_events=7)
    replay(cfg)
    oracle = replay_oracle(cfg)
    for t in ("a", "b"):
        ok, msg = tables_equal(read_table(lake, t), oracle[t], key="k")
        assert ok, f"table {t}: {msg}"
    a = read_table(lake, "a")
    assert a.schema.field("v").type == pa.int64()
    assert max(a["v"].to_pylist()) >= BIG * 2
    b = read_table(lake, "b")
    assert all(v >= BIG for v in b["v"].to_pylist())
    assert b.num_rows == 8  # 4 of 12 keys deleted (i % 3 == 0)
