"""Adversarial composition probes, round-4 continuation.

The late-round-4 sweep found silent-wrong-answer bugs only at feature
INTERSECTIONS (feeds x TRUNCATE, bootstrap x snapshots), so this file
pins the next shell of pairs none of the earlier suites exercise:

- read_changes across an OPTIMIZE rewrite (does the clustered base
  retain the tombstones a pre-optimize anchor's feed needs?)
- OPTIMIZE after TRUNCATE (predicate reads + synthetic-DELETE feeds
  over a clustered base)
- bootstrap_table x TRUNCATE (synthetic DELETEs for snapshot-loaded
  keys that never re-appear)
- read_history x TRUNCATE (is_current must agree with the live state;
  no pre-marker version may leak back in as "retained")
- staggered multi-table bootstrap (anchors are LAKE-wide: the later
  table reads EMPTY at earlier anchors and its feed from them carries
  every row as an UPSERT — the docstring contract of bootstrap_table)
- refresh_aggregate across ALTER COLUMN TYPE (sums stay exact while
  the summed column widens mid-window)
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from deltaray import (ReplayConfig, SnapshotExpiredError, read_changes,
                      read_history, read_table, read_table_ds, replay,
                      snapshots, tables_equal)
from deltaray.gen import gen_base, write_event_log
from deltaray.pipeline import (bootstrap_table, build_aggregate,
                               optimize_table, refresh_aggregate)
from deltaray.schemas import (ddl_payload, default_table_schema,
                              event_log_schema)
from deltaray.util import to_table


def _patch_ok(lake, anchor, as_of=None, table="docs"):
    """asof(anchor) + feed == state: the patch law, as (ok, msg), feed."""
    before = read_table(lake, table, asof_seq=anchor)
    cur = read_table(lake, table, asof_seq=as_of) if as_of \
        else read_table(lake, table)
    feed = to_table(read_changes(lake, table, since_seq=anchor,
                                 as_of_seq=as_of))
    changed = set(feed["doc_id"].to_pylist())
    assert len(changed) == feed.num_rows, "duplicate keys in feed"
    ups = feed.filter(pc.equal(feed["change"], "UPSERT")) \
        .select(cur.column_names)
    keep = before.filter(pa.array(
        [d not in changed for d in before["doc_id"].to_pylist()]))
    patched = pa.concat_tables([keep, ups], promote_options="default")
    return tables_equal(patched, cur, key="doc_id"), feed


def _tail_rows(schema, n, seed, first_seq=2, key_pool=100, table="docs"):
    """Hand-built DML tail (no CREATE_TABLE): bootstrap supplies schema."""
    rng = np.random.default_rng(seed)
    rows, seq = [], first_seq
    for i in range(n):
        op = ("INSERT", "UPDATE", "DELETE")[int(rng.integers(0, 3))]
        doc = f"{table}-doc{1000 + i:08d}" if op == "INSERT" \
            else f"{table}-doc{int(rng.integers(0, key_pool)):08d}"
        r = {"seq": seq, "op": op, "table": table, "doc_id": doc,
             "is_snapshot": False}
        if op != "DELETE":
            r.update(tokens=[int(x) for x in rng.integers(0, 100, 5)],
                     n_tok=5, source=str(rng.choice(["web", "code"])))
        rows.append(r)
        seq += 1
    return rows, seq


def _write_segments(log, log_schema, segments):
    """Write each list of row dicts as one event segment file."""
    os.makedirs(log, exist_ok=True)
    for si, seg in enumerate(segments):
        if not seg:
            continue
        cols = {f.name: [r.get(f.name) for r in seg] for f in log_schema}
        pq.write_table(
            pa.table(cols, schema=log_schema),
            f"{log}/events-{si:05d}-{seg[0]['seq']:012d}-"
            f"{seg[-1]['seq']:012d}.parquet")


def test_feed_patch_law_across_optimize(ray_session, tmp_path):
    """OPTIMIZE(vacuum=False) rewrites every partition into one
    clustered base whose seq range spans the anchor — the feed from a
    pre-optimize anchor must still name exactly the changed keys
    (clustering preserves per-row versions AND tombstones), including
    the DELETEs for keys that died between the anchor and the rewrite,
    and must NOT re-feed unchanged rows merely because the base file is
    new.  Bounded pulls at pre-optimize anchor pairs stay byte-stable
    across the rewrite."""
    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=120, n_events=1600, seed=83,
                    segment_max_events=200)
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=200, compact_every=100,
                        vacuum=False))
    snaps = snapshots(lake)
    anchor = snaps[1]
    bounded_before = to_table(read_changes(
        lake, "docs", since_seq=anchor, as_of_seq=snaps[-2])) \
        .sort_by([("doc_id", "ascending")])
    feed_before = to_table(read_changes(lake, "docs", since_seq=anchor)) \
        .sort_by([("doc_id", "ascending")])
    assert feed_before.filter(
        pc.equal(feed_before["change"], "DELETE")).num_rows > 0

    optimize_table(lake, "docs", "n_tok", vacuum=False, row_group_rows=64)

    (ok, msg), feed_after = _patch_ok(lake, anchor)
    assert ok, f"post-optimize patch law: {msg}"
    ok, msg = tables_equal(
        feed_after.sort_by([("doc_id", "ascending")]), feed_before,
        key="doc_id")
    assert ok, f"feed changed across OPTIMIZE: {msg}"
    bounded_after = to_table(read_changes(
        lake, "docs", since_seq=anchor, as_of_seq=snaps[-2])) \
        .sort_by([("doc_id", "ascending")])
    ok, msg = tables_equal(bounded_after, bounded_before, key="doc_id")
    assert ok, f"bounded feed changed across OPTIMIZE: {msg}"
    # with the default vacuum=True the superseded files are gone and the
    # pre-optimize anchor raises instead of under-feeding
    optimize_table(lake, "docs", "n_tok", row_group_rows=64)
    with pytest.raises(SnapshotExpiredError):
        to_table(read_changes(lake, "docs", since_seq=anchor,
                              as_of_seq=snaps[-2]))


def test_optimize_after_truncate(ray_session, tmp_path):
    """Clustering a table whose history crosses a TRUNCATE: predicate
    reads stay exact over the clustered base, and the synthetic-DELETE
    feed from a pre-truncate anchor survives the rewrite (the anchor
    state files are retained under vacuum=False)."""
    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=120, n_events=1600, seed=89,
                    segment_max_events=200,
                    ddl=[(900, "docs", "TRUNCATE_TABLE", {})])
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=200, compact_every=100,
                        vacuum=False))
    snaps = snapshots(lake)
    trunc_seq = 120 + 900 + 1
    pre = [s for s in snaps if s <= trunc_seq]
    feed_before = to_table(read_changes(lake, "docs", since_seq=pre[0])) \
        .sort_by([("doc_id", "ascending")])
    assert feed_before.filter(
        pc.equal(feed_before["change"], "DELETE")).num_rows > 0

    optimize_table(lake, "docs", "n_tok", vacuum=False, row_group_rows=64)

    (ok, msg), feed_after = _patch_ok(lake, pre[0])
    assert ok, f"patch law across truncate+optimize: {msg}"
    ok, msg = tables_equal(
        feed_after.sort_by([("doc_id", "ascending")]), feed_before,
        key="doc_id")
    assert ok, f"synthetic-DELETE feed changed across OPTIMIZE: {msg}"
    # predicate read == exact filter over the truncated+clustered state
    full = read_table(lake, "docs")
    got = to_table(read_table_ds(lake, "docs",
                                 predicate=("n_tok", ">", 10)))
    want = full.filter(pc.greater(full["n_tok"], 10))
    ok, msg = tables_equal(got.sort_by([("doc_id", "ascending")]),
                           want.sort_by([("doc_id", "ascending")]),
                           key="doc_id")
    assert ok, msg


def test_bootstrap_then_truncate_feed(ray_session, tmp_path):
    """Keys loaded by bootstrap_table carry no per-key events at all —
    when a TRUNCATE later wipes them, the feed from the bootstrap
    anchor must synthesize their DELETEs (the anchor state is the
    snapshot itself), and keys re-inserted after the marker must come
    back as plain UPSERTs."""
    import ray.data as rd

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    schema = default_table_schema()
    snap = gen_base(100, seed=41)
    log_schema = event_log_schema(schema)
    rows, seq = _tail_rows(schema, 250, seed=43)
    trunc_row = {"seq": seq, "op": "TRUNCATE_TABLE", "table": "docs",
                 "is_snapshot": False,
                 "ddl_payload": ddl_payload("TRUNCATE_TABLE")}
    trunc_seq = seq
    post, seq = _tail_rows(schema, 120, seed=47, first_seq=seq + 1,
                           key_pool=40)
    _write_segments(log, log_schema, [rows, [trunc_row], post])
    cfg = ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                       chunk_max_events=120, compact_every=100,
                       vacuum=False)
    bootstrap_table(cfg, schema, rd.from_arrow(snap), snapshot_seq=1)
    replay(cfg)
    assert snapshots(lake)[0] == 1

    (ok, msg), feed = _patch_ok(lake, 1)
    assert ok, f"bootstrap-anchor patch law across truncate: {msg}"
    dels = feed.filter(pc.equal(feed["change"], "DELETE"))
    assert set(dels["seq"].to_pylist()) <= {trunc_seq} | set(
        r["seq"] for r in post if r["op"] == "DELETE")
    # bootstrap keys (never re-touched after the marker) appear as
    # synthetic DELETEs at the marker's seq
    cur_keys = set(read_table(lake, "docs")["doc_id"].to_pylist())
    wiped_boot = [f"docs-doc{i:08d}" for i in range(40, 100)
                  if f"docs-doc{i:08d}" not in cur_keys]
    feed_del_keys = set(dels["doc_id"].to_pylist())
    missing = [k for k in wiped_boot if k not in feed_del_keys]
    assert not missing, f"bootstrap keys never retired: {missing[:5]}"


def test_read_history_across_truncate(ray_session, tmp_path):
    """read_history after a TRUNCATE: the marker hides every pre-marker
    commit, so (1) no retained version may predate the marker, (2)
    is_current must agree with the live table for every key — wiped
    keys have NO current version, re-inserted keys chain only their
    post-marker versions — and (3) valid_to_seq chains stay closed."""
    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=80, n_events=1200, seed=91,
                    segment_max_events=200,
                    ddl=[(700, "docs", "TRUNCATE_TABLE", {})])
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=200, compact_every=100,
                        vacuum=False))
    trunc_dir = os.path.join(lake, "gen=0000", "docs", "_truncate")
    trunc_seq = max(int(f.split("-")[1].split(".")[0])
                    for f in os.listdir(trunc_dir))
    cur_keys = set(read_table(lake, "docs")["doc_id"].to_pylist())
    keys = [f"docs-doc{i:08d}" for i in range(80)]
    h = read_history(lake, "docs", keys)
    assert h.num_rows > 0
    assert pc.min(h["seq"]).as_py() > trunc_seq, \
        "pre-truncate version leaked into the retained history"
    assert set(h.filter(h["is_current"])["doc_id"].to_pylist()) \
        == (cur_keys & set(keys))
    by_key: dict[str, list] = {}
    for r in h.sort_by([("doc_id", "ascending"),
                        ("seq", "ascending")]).to_pylist():
        by_key.setdefault(r["doc_id"], []).append(r)
    for k, rs in by_key.items():
        for a, b in zip(rs, rs[1:]):
            assert a["valid_to_seq"] == b["seq"] and not a["is_current"]
        assert rs[-1]["valid_to_seq"] is None
        assert rs[-1]["is_current"] == (k in cur_keys)


def test_staggered_multi_table_bootstrap(ray_session, tmp_path):
    """Anchors are LAKE-wide (bootstrap_table docstring): a table
    bootstrapped AFTER another table's replay reads as EMPTY at the
    earlier anchors, its unbounded feed from them carries every row as
    an UPSERT (patch law from an empty base), a bounded pull ending
    before its bootstrap rejects cleanly, and its history starts at the
    bootstrap seq."""
    import ray.data as rd

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    schema = default_table_schema()
    log_schema = event_log_schema(schema)
    rows, _ = _tail_rows(schema, 300, seed=7)
    _write_segments(log, log_schema, [rows])
    cfg = ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                       chunk_max_events=100, vacuum=False)
    bootstrap_table(cfg, schema, rd.from_arrow(gen_base(100, seed=5)),
                    snapshot_seq=1)
    replay(cfg)
    snaps = snapshots(lake)
    bseq = snaps[-1] + 1
    schema_b = default_table_schema("docs2", seq=bseq)
    bootstrap_table(cfg, schema_b,
                    rd.from_arrow(gen_base(60, seed=6, table="docs2")),
                    snapshot_seq=bseq)
    assert snapshots(lake) == snaps + [bseq]

    early = snaps[0]
    assert read_table(lake, "docs2", asof_seq=early).num_rows == 0
    cur_b = read_table(lake, "docs2")
    assert cur_b.num_rows == 60
    feed = to_table(read_changes(lake, "docs2", since_seq=early))
    assert set(feed["change"].to_pylist()) == {"UPSERT"}
    ok, msg = tables_equal(
        feed.drop_columns(["change", "seq"])
            .sort_by([("doc_id", "ascending")]),
        cur_b.sort_by([("doc_id", "ascending")]), key="doc_id")
    assert ok, msg
    with pytest.raises(KeyError, match="does not exist as of"):
        read_changes(lake, "docs2", since_seq=early, as_of_seq=snaps[-1])
    h = read_history(lake, "docs2", ["docs2-doc00000005"])
    assert h.num_rows == 1 and h["seq"][0].as_py() == bseq \
        and h["is_current"][0].as_py()
    # the FIRST table's reads are untouched by the second bootstrap
    (ok, msg), _ = _patch_ok(lake, early)
    assert ok, msg


def test_refresh_aggregate_across_alter_type(ray_session, tmp_path):
    """Incremental aggregate maintenance across an ALTER COLUMN TYPE of
    the summed column (int32 -> int64 mid-window): old contributions
    are read at the anchor under the anchor's narrow type, new ones
    arrive wide — the refresh must still equal the full recompute."""
    import ray.data as rd

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=120, n_events=1600, seed=97,
                    segment_max_events=200,
                    ddl=[(800, "docs", "ALTER_TABLE",
                          {"alter": ("n_tok", "int64")})])
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=200, compact_every=3,
                        vacuum=False))
    anchor = snapshots(lake)[0]
    agg0 = build_aggregate(
        rd.from_arrow(read_table(lake, "docs", asof_seq=anchor)),
        group_col="source", sum_cols=["n_tok"])
    agg1 = refresh_aggregate(lake, "docs", agg0, since_seq=anchor,
                             group_col="source", sum_cols=["n_tok"])
    full = build_aggregate(rd.from_arrow(read_table(lake, "docs")),
                           group_col="source", sum_cols=["n_tok"])
    ok, msg = tables_equal(agg1, full, key="source")
    assert ok, msg
