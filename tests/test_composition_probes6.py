"""Composition probes, round 6 (remaining untested matrix cells):

- replication chain x upstream RESHARD: reshard expires pre-migration
  anchors physically (old data files are not copied), so a LAGGING
  chain consumer's next pull against the new generation must raise
  SnapshotExpiredError cleanly and recover by re-bootstrap — while a
  consumer synced exactly AT the reshard watermark (== the new
  generation's floor) continues seamlessly with no re-bootstrap,
  because the floor anchor itself stays valid.
- DOUBLE reshard (gen0 -> gen1 -> gen2) with an ALTER COLUMN TYPE
  between the hops: schema history, truncate/drop markers and chunk
  manifests must survive TWO copytree hops, the tail replay after each
  hop must skip the already-applied prefix, and the final state must
  equal the single-shot oracle over the whole log.  Each hop's floor
  chains: gen-2 rejects gen-1 anchors below the second watermark.
- THREE-level chain (A -> B -> C): feed seqs propagate UNCHANGED
  through feed_to_events, so a mirror-of-a-mirror must converge to A
  exactly — including A's TRUNCATE chained through as synthetic
  DELETEs at one remove — and a full overlapping pull taken from A and
  applied directly to C must be an idempotent no-op (cross-level LWW).
- OPTIMIZE inside a sliding-retention ingest loop: clustered rewrites
  (vacuum=False, per the documented retention recipe) interleaved with
  expire_snapshots between chunks of ONE continuous replay
  (pipeline_chunks=1 honors "run it between replay chunks") — final
  state oracle-exact, the last retained anchor still readable and
  equal to its truncated-replay oracle, and a predicate read over the
  repeatedly re-clustered base exact.
"""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from deltaray import (ReplayConfig, SnapshotExpiredError, committed_watermark,
                      feed_to_events, read_changes, read_table, read_table_ds,
                      replay, replay_oracle, reshard_generation, snapshots,
                      tables_equal)
from deltaray.gen import write_event_log
from deltaray.pipeline import (bootstrap_table, expire_snapshots,
                               optimize_table)
from deltaray.schemas import default_table_schema
from deltaray.util import to_table


def _append_segment(log: str, ev: pa.Table, n: int) -> None:
    lo = ev["seq"][0].as_py()
    hi = ev["seq"][-1].as_py()
    os.makedirs(log, exist_ok=True)
    pq.write_table(ev, os.path.join(
        log, f"events-{n:05d}-{lo:012d}-{hi:012d}.parquet"))


def _prefix_log(src_log: str, dst: str, n_segments: int) -> str:
    os.makedirs(dst, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(src_log, "*.parquet")))[
            :n_segments]:
        shutil.copy(f, os.path.join(dst, os.path.basename(f)))
    return dst


def _truncated_oracle(event_log: str, tmp: str, S: int) -> pa.Table:
    d = os.path.join(tmp, f"trunc-{S}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for f in sorted(glob.glob(os.path.join(event_log, "*.parquet"))):
        t = pq.read_table(f)
        t = t.filter(pc.less_equal(t["seq"], S))
        if t.num_rows:
            pq.write_table(t, os.path.join(d, os.path.basename(f)))
    cfg = ReplayConfig(event_log=d, lake=os.path.join(tmp, "unused"))
    return replay_oracle(cfg)["docs"]


def test_chain_across_upstream_reshard(ray_session, tmp_path):
    """Upstream reshards mid-chain.  The consumer synced at the reshard
    watermark continues against generation 1 with a plain incremental
    pull; a lagging consumer's stale anchor raises SnapshotExpiredError
    and recovers by re-bootstrap.  Both mirrors converge to the gen-1
    head."""
    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    write_event_log(log_a, n_docs=160, n_events=2400, seed=601,
                    segment_max_events=400)
    prefix = _prefix_log(log_a, str(tmp_path / "prefix"), 3)
    replay(ReplayConfig(event_log=prefix, lake=lake_a, num_partitions=4,
                        chunk_max_events=400, vacuum=False))
    snaps0 = snapshots(lake_a)
    s_early = snaps0[0]
    wm = committed_watermark(lake_a, "docs")
    schema = default_table_schema()

    # consumer B synced exactly to the gen-0 head (the future floor)
    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    cfg_b = ReplayConfig(event_log=log_b, lake=lake_b, num_partitions=2,
                         chunk_max_events=10**9, vacuum=False)
    bootstrap_table(cfg_b, schema,
                    rd.from_arrow(read_table(lake_a, "docs", asof_seq=wm)),
                    snapshot_seq=wm)
    # consumer C lagging at an early gen-0 anchor
    log_c, lake_c = str(tmp_path / "ev-c"), str(tmp_path / "lk-c")
    cfg_c = ReplayConfig(event_log=log_c, lake=lake_c, num_partitions=2,
                         chunk_max_events=10**9, vacuum=False)
    bootstrap_table(cfg_c, schema,
                    rd.from_arrow(read_table(lake_a, "docs",
                                             asof_seq=s_early)),
                    snapshot_seq=s_early)

    reshard_generation(lake_a, 7)
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=7,
                        generation=1, chunk_max_events=400, vacuum=False))
    head = snapshots(lake_a, 1)[-1]
    upstream = read_table(lake_a, "docs", generation=1)

    # B continues seamlessly: the watermark anchor IS gen-1's floor
    feed = to_table(read_changes(lake_a, "docs", since_seq=wm,
                                 generation=1, as_of_seq=head))
    assert feed.num_rows > 0
    _append_segment(log_b, feed_to_events(feed, schema), 0)
    replay(cfg_b)
    ok, msg = tables_equal(read_table(lake_b, "docs"), upstream)
    assert ok, f"watermark-synced mirror diverged: {msg}"

    # C's stale anchor predates the migration: physical retention
    try:
        to_table(read_changes(lake_a, "docs", since_seq=s_early,
                              generation=1, as_of_seq=head))
        raise AssertionError("pre-reshard anchor did not raise")
    except SnapshotExpiredError:
        pass
    # documented recovery: re-bootstrap at a retained gen-1 anchor
    shutil.rmtree(lake_c)
    bootstrap_table(cfg_c, schema,
                    rd.from_arrow(read_table(lake_a, "docs",
                                             generation=1, asof_seq=head)),
                    snapshot_seq=head)
    ok, msg = tables_equal(read_table(lake_c, "docs"), upstream)
    assert ok, f"re-bootstrapped mirror diverged: {msg}"


def test_double_reshard_with_alter_between(ray_session, tmp_path):
    """gen0(4 parts) -> reshard -> gen1(7) -> tail replay crossing an
    int32->int64 ALTER -> reshard -> gen2(3) -> final tail.  The
    migrated metadata (schema history, chunk manifests) survives two
    hops: every prefix is skipped, the final state is oracle-exact
    under the WIDENED type, and gen-2's floor rejects gen-1 anchors
    below the second migration watermark."""
    log = str(tmp_path / "events")
    lake = str(tmp_path / "lake")
    write_event_log(log, n_docs=200, n_events=3200, seed=607,
                    segment_max_events=400,
                    ddl=[(1700, "docs", "ALTER_TABLE",
                          {"alter": ("n_tok", "int64")})])
    replay(ReplayConfig(event_log=_prefix_log(log, str(tmp_path / "p1"), 3),
                        lake=lake, num_partitions=4,
                        chunk_max_events=400, vacuum=False))
    reshard_generation(lake, 7)

    # tail replay inside gen1 crosses the ALTER
    r1 = replay(ReplayConfig(
        event_log=_prefix_log(log, str(tmp_path / "p2"), 6), lake=lake,
        num_partitions=7, generation=1, chunk_max_events=400, vacuum=False))
    assert r1["lineage_total"] > 0
    assert read_table(lake, "docs",
                      generation=1).schema.field("n_tok").type == pa.int64()
    g1_mid = snapshots(lake, 1)[0]          # gen-1 base anchor
    wm2 = committed_watermark(lake, "docs", 1)

    reshard_generation(lake, 3, src_generation=1)
    r2 = replay(ReplayConfig(event_log=log, lake=lake, num_partitions=3,
                             generation=2, chunk_max_events=400,
                             vacuum=False))
    assert r2["lineage_total"] > 0

    got = read_table(lake, "docs", generation=2)
    assert got.schema.field("n_tok").type == pa.int64()
    want = replay_oracle(
        ReplayConfig(event_log=log, lake=str(tmp_path / "unused")))["docs"]
    ok, msg = tables_equal(got, want)
    assert ok, msg

    # replaying the full log against gen2 again is a no-op (markers
    # carried through both hops)
    assert replay(ReplayConfig(event_log=log, lake=lake, num_partitions=3,
                               generation=2, chunk_max_events=400,
                               vacuum=False))["lineage_total"] == 0
    # floor chains across hops: a gen-1 anchor below the second
    # migration watermark is physically gone in gen2
    assert g1_mid < wm2
    try:
        read_table(lake, "docs", generation=2, asof_seq=g1_mid)
        raise AssertionError("gen-1 anchor readable in gen2")
    except SnapshotExpiredError:
        pass
    # the second watermark itself is gen-2's floor and stays valid
    ok, msg = tables_equal(
        read_table(lake, "docs", generation=2, asof_seq=wm2),
        _truncated_oracle(log, str(tmp_path), wm2))
    assert ok, msg


def test_three_level_chain(ray_session, tmp_path):
    """A -> B -> C: C mirrors a mirror.  Seqs propagate unchanged, so C
    converges to A exactly — A's TRUNCATE arrives at C as synthetic
    DELETEs relayed THROUGH B — and a full overlapping pull taken from
    A applied directly to C is an idempotent no-op."""
    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    write_event_log(log_a, n_docs=120, n_events=2000, seed=613,
                    segment_max_events=250,
                    ddl=[(900, "docs", "TRUNCATE_TABLE", {})])
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    sa = snapshots(lake_a)
    s0, s_mid, s_hi = sa[1], sa[len(sa) // 2], sa[-1]
    assert s0 < 900 < s_mid, "TRUNCATE must sit inside B's first pull"
    schema = default_table_schema()

    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    cfg_b = ReplayConfig(event_log=log_b, lake=lake_b, num_partitions=3,
                         chunk_max_events=10**9, vacuum=False)
    bootstrap_table(cfg_b, schema,
                    rd.from_arrow(read_table(lake_a, "docs", asof_seq=s0)),
                    snapshot_seq=s0)
    for n, (lo, hi) in enumerate([(s0, s_mid), (s_mid, s_hi)]):
        feed = to_table(read_changes(lake_a, "docs", since_seq=lo,
                                     as_of_seq=hi))
        _append_segment(log_b, feed_to_events(feed, schema), n)
        replay(cfg_b)

    # C bootstraps from B's RETAINED MID-HISTORY anchor, then pulls
    # B's own change feed to B's head
    log_c, lake_c = str(tmp_path / "ev-c"), str(tmp_path / "lk-c")
    cfg_c = ReplayConfig(event_log=log_c, lake=lake_c, num_partitions=2,
                         chunk_max_events=10**9, vacuum=False)
    bootstrap_table(cfg_c, schema,
                    rd.from_arrow(read_table(lake_b, "docs",
                                             asof_seq=s_mid)),
                    snapshot_seq=s_mid)
    feed_bc = to_table(read_changes(lake_b, "docs", since_seq=s_mid,
                                    as_of_seq=s_hi))
    assert feed_bc.num_rows > 0
    _append_segment(log_c, feed_to_events(feed_bc, schema), 0)
    replay(cfg_c)

    cur_a = read_table(lake_a, "docs")
    ok, msg = tables_equal(read_table(lake_c, "docs"), cur_a)
    assert ok, f"grandchild mirror diverged: {msg}"
    # the truncate actually retired keys end-to-end
    at_s0 = set(read_table(lake_a, "docs", asof_seq=s0)["doc_id"]
                .to_pylist())
    assert at_s0 - set(cur_a["doc_id"].to_pylist()), \
        "probe needs keys that died upstream"
    # cross-level idempotence: a full pull from A applied straight to C
    feed_ac = to_table(read_changes(lake_a, "docs", since_seq=s0,
                                    as_of_seq=s_hi))
    _append_segment(log_c, feed_to_events(feed_ac, schema), 99)
    replay(cfg_c)
    ok, msg = tables_equal(read_table(lake_c, "docs"), cur_a)
    assert ok, f"overlapping A->C re-apply changed the mirror: {msg}"


def test_optimize_inside_sliding_retention_replay(ray_session, tmp_path):
    """One continuous ingest with OPTIMIZE(vacuum=False) + sliding
    expire_snapshots fired every 3rd chunk boundary
    (pipeline_chunks=1 => no in-flight merge when the hook runs).
    Final state oracle-exact; the last retained anchor reads back equal
    to its truncated-replay oracle; predicate reads over the
    re-clustered base exact."""
    log, lake = str(tmp_path / "events"), str(tmp_path / "lake")
    write_event_log(log, n_docs=200, n_events=2400, seed=619,
                    segment_max_events=300)
    state = {"k": 0, "opts": 0, "expires": 0, "retain": None}

    def hook(idx, chunk, rows):
        state["k"] += 1
        if state["k"] % 3 == 0:
            res = optimize_table(lake, "docs", "n_tok", vacuum=False)
            assert res["files_removed"] == 0
            state["opts"] += 1
            sn = snapshots(lake)
            if len(sn) >= 3:
                state["retain"] = sn[-2]
                expire_snapshots(lake, "docs", sn[-2])
                state["expires"] += 1

    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=300, vacuum=False,
                        compact_every=2, pipeline_chunks=1),
           on_chunk=hook)
    assert state["opts"] >= 2 and state["expires"] >= 1

    want = replay_oracle(
        ReplayConfig(event_log=log, lake=str(tmp_path / "unused")))["docs"]
    ok, msg = tables_equal(read_table(lake, "docs"), want)
    assert ok, msg
    R = state["retain"]
    ok, msg = tables_equal(read_table(lake, "docs", asof_seq=R),
                           _truncated_oracle(log, str(tmp_path), R))
    assert ok, f"retained anchor {R} diverged: {msg}"
    cur = read_table(lake, "docs")
    got = to_table(read_table_ds(lake, "docs",
                                 predicate=("n_tok", ">=", 12)))
    ok, msg = tables_equal(got, cur.filter(pc.greater_equal(cur["n_tok"],
                                                            12)))
    assert ok, msg
