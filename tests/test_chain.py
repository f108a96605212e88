"""Replication chaining: a downstream lake mirrors an upstream lake
through the CDC-out feed alone — bootstrap from a snapshot anchor, then
apply successive `read_changes` pulls converted by `feed_to_events`
into ordinary event-log segments.  This is the engine consuming ITSELF
as a source (the reference's replication-chain shape: one pipeline's
target feeding another's DeltaSource), and it exercises the whole
contract stack at once: anchored reproducible pulls, preserved winning
versions (downstream LWW == upstream LWW), synthetic TRUNCATE deletes
chaining through as ordinary deletes, and idempotent re-application of
an overlapping pull.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from deltaray import (ReplayConfig, feed_to_events, read_changes,
                      read_table, replay, snapshots, tables_equal)
from deltaray.gen import write_event_log
from deltaray.pipeline import bootstrap_table
from deltaray.schemas import default_table_schema
from deltaray.util import to_table


def _append_segment(log: str, ev: pa.Table, n: int) -> None:
    lo = ev["seq"][0].as_py()
    hi = ev["seq"][-1].as_py()
    os.makedirs(log, exist_ok=True)
    pq.write_table(ev, os.path.join(
        log, f"events-{n:05d}-{lo:012d}-{hi:012d}.parquet"))


def test_changes_cli_emit_events(ray_session, tmp_path, capsys):
    """`python -m deltaray changes --emit-events`: one CLI pull lands a
    replayable segment; a bootstrapped downstream lake catches up to
    the upstream head with one replay."""
    import json

    import ray.data as rd

    from deltaray.__main__ import main

    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    write_event_log(log_a, n_docs=80, n_events=1000, seed=173,
                    segment_max_events=250)
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=3,
                        chunk_max_events=250, vacuum=False))
    snaps = snapshots(lake_a)
    s0 = snaps[0]
    schema = default_table_schema()
    cfg_b = ReplayConfig(event_log=log_b, lake=lake_b, num_partitions=2,
                         chunk_max_events=10**9)
    bootstrap_table(cfg_b, schema,
                    rd.from_arrow(read_table(lake_a, "docs", asof_seq=s0)),
                    snapshot_seq=s0)

    assert main(["changes", "--lake", lake_a, "--table", "docs",
                 "--since", str(s0), "--as-of", str(snaps[-1]),
                 "--out", log_b, "--emit-events"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0 and out["segment"]
    replay(cfg_b)
    ok, msg = tables_equal(read_table(lake_b, "docs"),
                           read_table(lake_a, "docs"))
    assert ok, msg


def test_chained_lakes_mirror(ray_session, tmp_path):
    import ray.data as rd

    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    write_event_log(log_a, n_docs=120, n_events=1800, seed=171,
                    segment_max_events=200,
                    ddl=[(900, "docs", "TRUNCATE_TABLE", {})])
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=4,
                        chunk_max_events=200, compact_every=3,
                        vacuum=False))
    snaps = snapshots(lake_a)
    s0 = snaps[1]
    schema = default_table_schema()

    cfg_b = ReplayConfig(event_log=log_b, lake=lake_b, num_partitions=3,
                         chunk_max_events=10**9, vacuum=False,
                         manifest_every=2)
    bootstrap_table(cfg_b, schema,
                    rd.from_arrow(read_table(lake_a, "docs", asof_seq=s0)),
                    snapshot_seq=s0)

    # incremental pulls at committed anchors, applied as B's own events
    prev = s0
    pulls = [snaps[len(snaps) // 2], snaps[-1]]
    for n, nxt in enumerate(pulls):
        feed = to_table(read_changes(lake_a, "docs", since_seq=prev,
                                     as_of_seq=nxt))
        assert feed.num_rows > 0
        _append_segment(log_b, feed_to_events(feed, schema), n)
        replay(cfg_b)
        ok, msg = tables_equal(read_table(lake_b, "docs"),
                               read_table(lake_a, "docs", asof_seq=nxt))
        assert ok, f"mirror diverged at anchor {nxt}: {msg}"
        prev = nxt

    cur_a = read_table(lake_a, "docs")
    ok, msg = tables_equal(read_table(lake_b, "docs"), cur_a)
    assert ok, f"final mirror: {msg}"
    # the chain crossed A's TRUNCATE: its synthetic DELETEs must have
    # retired the wiped keys downstream too
    at_s0 = set(read_table(lake_a, "docs", asof_seq=s0)["doc_id"]
                .to_pylist())
    assert at_s0 - set(cur_a["doc_id"].to_pylist()), \
        "probe needs keys that died upstream"

    # idempotence: replaying B again is a no-op, and re-applying a full
    # OVERLAPPING pull (s0 -> head) changes nothing — every event loses
    # or ties the LWW race against the mirrored state
    assert replay(cfg_b)["lineage_total"] == 0
    feed_all = to_table(read_changes(lake_a, "docs", since_seq=s0,
                                     as_of_seq=snaps[-1]))
    _append_segment(log_b, feed_to_events(feed_all, schema), 99)
    replay(cfg_b)
    ok, msg = tables_equal(read_table(lake_b, "docs"), cur_a)
    assert ok, f"overlapping re-apply changed the mirror: {msg}"
