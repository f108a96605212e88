"""Composition probes, round 5 (remaining untested matrix cells):

- as-of time travel x ALTER COLUMN TYPE: a snapshot anchored BEFORE a
  widening alter must come back under the OLD type (the schema
  effective at that seq) and equal the truncated-replay oracle; after
  it, the new type.  (The rename analog is pinned in
  test_time_travel.py; the type axis was not.)
- refresh_aggregate x generation reshard: an aggregate anchored at the
  old generation's head — which is exactly the NEW generation's
  snapshot floor — must refresh cleanly inside the new generation and
  equal a full recompute (the boundary anchor == floor is the
  off-by-one risk).
- replication chaining x upstream OPTIMIZE: a clustered rewrite (+
  vacuum of superseded files) between bootstrap and catch-up must not
  surface as spurious changes or break the pull; the chained mirror
  converges to the upstream head exactly.
- CLI x retention: an expired `--since` anchor is a normal state for a
  lagging chain consumer — one JSON error line + exit 2, no traceback.
"""

import glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from deltaray import (ReplayConfig, read_table, replay, replay_oracle,
                      reshard_generation, snapshots, tables_equal)
from deltaray.gen import write_event_log
from deltaray.pipeline import (bootstrap_table, build_aggregate,
                               optimize_table, refresh_aggregate)
from deltaray.schemas import default_table_schema


def _truncated_oracle(event_log: str, tmp: str, S: int) -> pa.Table:
    d = os.path.join(tmp, f"trunc-{S}")
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    # segments straddling the ALTER differ in payload type (int32 vs
    # int64) — keep them as separate files, exactly like the real log
    for f in sorted(glob.glob(os.path.join(event_log, "*.parquet"))):
        t = pq.read_table(f)
        t = t.filter(pc.less_equal(t["seq"], S))
        if t.num_rows:
            pq.write_table(t, os.path.join(d, os.path.basename(f)))
    cfg = ReplayConfig(event_log=d, lake=os.path.join(tmp, "unused"))
    return replay_oracle(cfg)["docs"]


def test_asof_across_alter_type(ray_session, tmp_path):
    """Snapshots straddling an int32→int64 ALTER read back under the
    schema effective at their anchor, values oracle-exact both sides."""
    log, lake = str(tmp_path / "events"), str(tmp_path / "lake")
    write_event_log(log, n_docs=120, n_events=2000, seed=521,
                    segment_max_events=500,
                    ddl=[(1200, "docs", "ALTER_TABLE",
                          {"alter": ("n_tok", "int64")})])
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=500, vacuum=False))
    from deltaray.commit import LakeState

    ddl_seq = LakeState(lake).schemas_for("docs")[-1].version_seq
    snaps = snapshots(lake)
    pre = [s for s in snaps if s < ddl_seq]
    post = [s for s in snaps if s > ddl_seq]
    assert pre and post
    early = read_table(lake, "docs", asof_seq=pre[-1])
    assert early.schema.field("n_tok").type == pa.int32()
    late = read_table(lake, "docs", asof_seq=post[0])
    assert late.schema.field("n_tok").type == pa.int64()
    ok, msg = tables_equal(
        early, _truncated_oracle(log, str(tmp_path), pre[-1]))
    assert ok, msg
    ok, msg = tables_equal(
        late, _truncated_oracle(log, str(tmp_path), post[0]))
    assert ok, msg


def test_refresh_aggregate_across_reshard(ray_session, tmp_path):
    """An aggregate anchored at the reshard watermark (== the new
    generation's floor) refreshes inside generation 1 and equals a
    full recompute over the migrated, tail-replayed state."""
    log = str(tmp_path / "events")
    prefix = str(tmp_path / "prefix")
    lake = str(tmp_path / "lake")
    write_event_log(log, n_docs=200, n_events=3200, seed=523,
                    segment_max_events=400)
    os.makedirs(prefix)
    for f in sorted(glob.glob(os.path.join(log, "*.parquet")))[:4]:
        shutil.copy(f, os.path.join(prefix, os.path.basename(f)))
    replay(ReplayConfig(event_log=prefix, lake=lake, num_partitions=4,
                        chunk_max_events=400, vacuum=False))
    anchor = snapshots(lake)[-1]          # gen-0 head == gen-1 floor
    agg0 = build_aggregate(
        rd.from_arrow(read_table(lake, "docs", asof_seq=anchor)),
        group_col="source", sum_cols=["n_tok"])

    reshard_generation(lake, 8)
    cfg1 = ReplayConfig(event_log=log, lake=lake, num_partitions=8,
                        generation=1, chunk_max_events=400, vacuum=False)
    replay(cfg1)

    got = refresh_aggregate(lake, "docs", agg0, since_seq=anchor,
                            group_col="source", sum_cols=["n_tok"],
                            generation=1)
    full = build_aggregate(
        rd.from_arrow(read_table(lake, "docs", generation=1)),
        group_col="source", sum_cols=["n_tok"])
    ok, msg = tables_equal(got, full, key="source")
    assert ok, msg


def test_chain_across_upstream_optimize(ray_session, tmp_path, capsys):
    """OPTIMIZE (clustered rewrite + vacuum of superseded files) between
    a downstream bootstrap and its catch-up pull: the feed stays exact
    and the chained mirror converges to the upstream head."""
    from deltaray.__main__ import main

    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    write_event_log(log_a, n_docs=150, n_events=1600, seed=529,
                    segment_max_events=400)
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=3,
                        chunk_max_events=400, vacuum=False))
    s0 = snapshots(lake_a)[0]
    schema = default_table_schema()
    cfg_b = ReplayConfig(event_log=log_b, lake=lake_b, num_partitions=2,
                         chunk_max_events=10**9)
    bootstrap_table(cfg_b, schema,
                    rd.from_arrow(read_table(lake_a, "docs", asof_seq=s0)),
                    snapshot_seq=s0)

    optimize_table(lake_a, "docs", cluster_by="doc_id", vacuum=True)

    assert main(["changes", "--lake", lake_a, "--table", "docs",
                 "--since", str(s0), "--out", log_b,
                 "--emit-events"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0
    replay(cfg_b)
    ok, msg = tables_equal(read_table(lake_b, "docs"),
                           read_table(lake_a, "docs"))
    assert ok, msg


def test_cli_changes_expired_anchor_exits_cleanly(ray_session, tmp_path,
                                                  capsys):
    """`deltaray changes --since <expired>` is a normal operational
    state for a lagging chain consumer: one JSON error line naming
    SnapshotExpiredError and exit code 2, not a traceback."""
    from deltaray.__main__ import main
    from deltaray.pipeline import expire_snapshots

    log, lake = str(tmp_path / "events"), str(tmp_path / "lake")
    write_event_log(log, n_docs=100, n_events=1200, seed=541,
                    segment_max_events=300)
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=2,
                        chunk_max_events=300, vacuum=False))
    snaps = snapshots(lake)
    expire_snapshots(lake, "docs", snaps[-2])

    rc = main(["changes", "--lake", lake, "--table", "docs",
               "--since", str(snaps[0])])
    assert rc == 2
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "SnapshotExpiredError" in out["error"]
