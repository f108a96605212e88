"""Composition probes, round 4 (this session's untested matrix cells):

- chaining x retention: a downstream lake whose sync anchor fell below
  the upstream's raised snapshot floor must FAIL LOUDLY (not silently
  mirror an incomplete feed), and recovery = re-bootstrap at a retained
  anchor, after which the mirror converges exactly.
- multi-segment --emit-events x replay: a catch-up pull larger than the
  emit batch size streams SEVERAL segments; the one-segment JSON
  contract nulls (not silently repoints), and a downstream replay over
  all emitted segments reaches upstream state exactly.
"""

import json
import os

import pyarrow as pa
import pytest
import ray.data as rd

from deltaray import (ReplayConfig, read_changes, read_table, replay,
                      snapshots, tables_equal)
from deltaray.gen import write_event_log
from deltaray.pipeline import bootstrap_table, expire_snapshots
from deltaray.schemas import default_table_schema


def test_chain_sync_across_retention_floor(ray_session, tmp_path):
    """Retention floor raise invalidates a downstream chain anchor:
    the stale pull raises, and a re-bootstrap at a retained anchor
    mirrors the upstream head exactly."""
    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    write_event_log(log_a, n_docs=100, n_events=1500, seed=311,
                    segment_max_events=300)
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=3,
                        chunk_max_events=300, vacuum=False))
    snaps = snapshots(lake_a)
    assert len(snaps) >= 3
    s0, retained = snaps[0], snaps[-2]

    # downstream bootstrapped at the OLDEST anchor
    schema = default_table_schema()
    cfg_b = ReplayConfig(event_log=log_b, lake=lake_b, num_partitions=2,
                         chunk_max_events=10**9)
    bootstrap_table(cfg_b, schema,
                    rd.from_arrow(read_table(lake_a, "docs", asof_seq=s0)),
                    snapshot_seq=s0)

    # upstream raises its snapshot floor past the downstream anchor
    expire_snapshots(lake_a, "docs", retained)

    # the stale chain pull must raise, not emit a partial feed
    from deltaray.pipeline import SnapshotExpiredError

    with pytest.raises(SnapshotExpiredError, match="snapshot floor"):
        read_changes(lake_a, "docs", s0).count()

    # recovery: re-bootstrap at a RETAINED anchor, then catch up
    log_b2, lake_b2 = str(tmp_path / "ev-b2"), str(tmp_path / "lk-b2")
    cfg_b2 = ReplayConfig(event_log=log_b2, lake=lake_b2,
                          num_partitions=2, chunk_max_events=10**9)
    bootstrap_table(cfg_b2, schema,
                    rd.from_arrow(read_table(lake_a, "docs",
                                             asof_seq=retained)),
                    snapshot_seq=retained)
    from deltaray import feed_to_events
    from deltaray.util import to_table

    feed = to_table(read_changes(lake_a, "docs", retained))
    if feed.num_rows:
        ev = feed_to_events(feed, schema, table="docs")
        lo = ev["seq"][0].as_py()
        hi = ev["seq"][-1].as_py()
        os.makedirs(log_b2, exist_ok=True)
        import pyarrow.parquet as pq

        pq.write_table(ev, os.path.join(
            log_b2, f"events-90000-{lo:012d}-{hi:012d}.parquet"))
    replay(cfg_b2)
    ok, msg = tables_equal(read_table(lake_b2, "docs"),
                           read_table(lake_a, "docs"))
    assert ok, msg


def test_emit_events_multi_segment_replay(ray_session, tmp_path, capsys):
    """--emit-events with a batch size smaller than the pull: several
    segments stream out, the single-segment JSON field nulls, and a
    downstream replay over ALL of them reaches upstream state."""
    from deltaray.__main__ import main

    log_a, lake_a = str(tmp_path / "ev-a"), str(tmp_path / "lk-a")
    log_b, lake_b = str(tmp_path / "ev-b"), str(tmp_path / "lk-b")
    write_event_log(log_a, n_docs=150, n_events=1200, seed=313,
                    segment_max_events=400)
    replay(ReplayConfig(event_log=log_a, lake=lake_a, num_partitions=3,
                        chunk_max_events=400, vacuum=False))
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
                 "--out", log_b, "--emit-events",
                 "--emit-batch-rows", "16"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["segments"] > 1, out
    assert out["segment"] is None            # loud multi-segment contract
    assert len(out["segment_paths"]) == out["segments"]
    assert all(os.path.exists(p) for p in out["segment_paths"])
    assert out["rows"] > 16

    replay(cfg_b)
    ok, msg = tables_equal(read_table(lake_b, "docs"),
                           read_table(lake_a, "docs"))
    assert ok, msg
