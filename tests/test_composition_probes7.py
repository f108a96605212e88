"""Composition probes, round 7 (remaining untested matrix cells):

- OPTIMIZE x ADD COLUMN: a clustered rewrite over partitions whose
  base/delta files straddle an ALTER_TABLE(add) — the rewrite's
  merge-on-read must unify the schemas (old rows null-fill) and a
  predicate read on the LATE-ADDED column must stay exact: zone maps
  for the new column simply don't exist on pre-DDL files, so pruning
  must conservatively read them, never skip.
- zone-map pruning x ALTER COLUMN TYPE: files written under int32
  carry int zone maps; after ALTER to int64 (and, adversarially, to
  string) predicate reads with the NEW-typed literal must equal the
  exact filter over mixed-stat files, before and after an OPTIMIZE
  taken mid-history.  ``stats_disjoint`` must treat any stats/literal
  type mismatch as "cannot prune", never as "disjoint".
- refresh_aggregate x RENAME of the group column: the change feed
  arrives under the FINAL schema, but the retired-contribution point
  lookups run at the PRE-RENAME anchor where the snapshot reads back
  under the OLD name (the pinned rename law) — the incremental
  refresh must still equal the full recompute under the new name.
- point-lookup key routing x reshard x OPTIMIZE: partition routing
  replays the generation's own hash, so lookups and key-equality
  predicate routing must stay exact (and still PRUNE) after the data
  migrates into a new generation with a different partition count and
  is re-clustered there.
"""

import pyarrow as pa
import pyarrow.compute as pc

from deltaray import (ReplayConfig, optimize_table, read_table, read_table_ds,
                      replay, replay_oracle, reshard_generation)
from deltaray.gen import write_event_log
from deltaray.pipeline import build_aggregate, read_rows, refresh_aggregate
from deltaray.util import to_table


def _pred_vs_filter(lake, table, pred, generation=0, io_stats=None):
    col, op, lit = pred
    got = to_table(read_table_ds(lake, table, predicate=pred,
                                 generation=generation,
                                 io_stats_out=io_stats))
    full = to_table(read_table_ds(lake, table, generation=generation))
    ops = {"==": pc.equal, "<": pc.less, "<=": pc.less_equal,
           ">": pc.greater, ">=": pc.greater_equal}
    want = full.filter(ops[op](full[col], lit)).sort_by("doc_id")
    got = got.sort_by("doc_id") if got.num_rows else got
    assert got.num_rows == want.num_rows, \
        f"predicate {pred}: {got.num_rows} rows != exact {want.num_rows}"
    if got.num_rows:
        assert got.select(sorted(got.column_names)).equals(
            want.select(sorted(want.column_names))), \
            f"predicate {pred} read != filtered full read"


def test_optimize_across_add_column(ray_session, tmp_path):
    """ADD COLUMN lands mid-stream; OPTIMIZE afterwards rewrites
    partitions whose files straddle the DDL.  Predicate reads on both
    the original cluster column and the late-added column must equal
    the exact filter (old rows are null on the new column, and nulls
    never satisfy a comparison predicate)."""
    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=150, n_events=2000, seed=701,
                    ddl=[(900, "docs", "ALTER_TABLE",
                          {"add": ("lang", "string"),
                           "choices": ["en", "de", "fr"]})])
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=300, vacuum=False))
    state = read_table(lake, "docs")
    assert "lang" in state.column_names
    # pre-DDL survivors never updated after the DDL carry null lang
    assert state["lang"].null_count > 0, "probe needs mixed-schema rows"

    optimize_table(lake, "docs", "n_tok")
    for pred in [("n_tok", ">=", 30), ("n_tok", "<", 12),
                 ("lang", "==", "de"), ("lang", ">=", "fr")]:
        io = {}
        _pred_vs_filter(lake, "docs", pred, io_stats=io)
    # final state itself still equals the oracle after the rewrite
    cfg = ReplayConfig(event_log=log, lake=str(tmp_path / "unused"))
    want = replay_oracle(cfg)["docs"]
    got = read_table(lake, "docs").sort_by("doc_id")
    assert got.num_rows == want.num_rows


def test_predicate_prune_across_alter_type(ray_session, tmp_path):
    """Files written as int32 carry int zone maps; after ALTER COLUMN
    TYPE to int64 the same predicates must stay exact over mixed-stat
    files, and an OPTIMIZE over the mixed history must unify.  The
    string-alter leg pins the TypeError guard in stats_disjoint:
    int stats vs string literal must read, never prune."""
    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=120, n_events=1600, seed=702,
                    ddl=[(800, "docs", "ALTER_TABLE",
                          {"alter": ("n_tok", "int64")})])
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    state = read_table(lake, "docs")
    assert pa.types.is_int64(state.schema.field("n_tok").type)
    for pred in [("n_tok", ">=", 25), ("n_tok", "==", 16),
                 ("n_tok", "<", 8), ("n_tok", ">", 10_000)]:
        _pred_vs_filter(lake, "docs", pred)
    optimize_table(lake, "docs", "n_tok")
    for pred in [("n_tok", ">=", 25), ("n_tok", "<", 8)]:
        io = {}
        _pred_vs_filter(lake, "docs", pred, io_stats=io)

    # adversarial: int -> STRING alter appended as a trailing DDL-only
    # segment (the generator cannot synthesize post-alter string DML);
    # every stored file + zone map keeps int values under a now-string
    # schema — the exact stats/literal type-mismatch case
    import glob
    import os

    import pyarrow.parquet as pq

    from deltaray.schemas import ddl_payload

    log2, lake2 = str(tmp_path / "ev2"), str(tmp_path / "lk2")
    write_event_log(log2, n_docs=80, n_events=900, seed=703)
    last = pq.read_table(
        sorted(glob.glob(os.path.join(log2, "*.parquet")))[-1])
    s = last["seq"][-1].as_py() + 1
    row = {n: [None] for n in last.schema.names}
    row.update(seq=[s], op=["ALTER_TABLE"], table=["docs"],
               ddl_payload=[ddl_payload(
                   "ALTER_TABLE", alter=("n_tok", "string"))])
    pq.write_table(
        pa.table(row, schema=last.schema),
        os.path.join(log2, f"events-99999-{s:012d}-{s:012d}.parquet"))
    os.remove(os.path.join(log2, "manifest.json"))  # force glob discovery
    replay(ReplayConfig(event_log=log2, lake=lake2, num_partitions=2,
                        chunk_max_events=200, vacuum=False))
    st2 = read_table(lake2, "docs")
    assert pa.types.is_string(st2.schema.field("n_tok").type)
    for pred in [("n_tok", ">=", "2"), ("n_tok", "==", "16")]:
        _pred_vs_filter(lake2, "docs", pred)


def test_refresh_aggregate_across_group_rename(ray_session, tmp_path):
    """The group column is RENAMED between the anchor and the head.
    The feed arrives under the final name; the retired-contribution
    point lookups run at the pre-rename anchor (old-name snapshot law).
    The incremental refresh under the NEW name must equal the full
    recompute (caller carries prev forward under the new name, the
    documented schema-evolution step for any downstream view)."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=100, n_events=1400, seed=704,
                    ddl=[(800, "docs", "RENAME_COLUMN",
                          {"rename": ("source", "origin")})])

    # replay the pre-rename prefix only, snapshot the aggregate there
    seg_files = sorted(glob.glob(os.path.join(log, "*.parquet")))
    prefix = str(tmp_path / "prefix")
    os.makedirs(prefix)
    # pre-rename prefix = the segments before the DDL barrier (the
    # generator flushes a segment boundary at every DDL)
    pre_parts = []
    for f in seg_files:
        t = pq.read_table(f)
        if pc.any(pc.equal(t["op"], "RENAME_COLUMN")).as_py():
            break
        pre_parts.append(t)
    pre = pa.concat_tables(pre_parts)
    pq.write_table(pre, os.path.join(
        prefix, f"events-00000-{pre['seq'][0].as_py():012d}-"
                f"{pre['seq'][-1].as_py():012d}.parquet"))
    replay(ReplayConfig(event_log=prefix, lake=lake, num_partitions=4,
                        chunk_max_events=300, vacuum=False))
    anchor = pre["seq"][-1].as_py()
    import ray.data as rd
    prev = build_aggregate(
        rd.from_arrow(read_table(lake, "docs")),
        group_col="source", sum_cols=["n_tok"])

    # tail replay applies the rename + post-rename DML
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=300, vacuum=False))
    head = read_table(lake, "docs")
    assert "origin" in head.column_names and \
        "source" not in head.column_names

    # caller renames prev to the new name (its own schema-evolution step)
    prev_new = prev.rename_columns(
        ["origin" if c == "source" else c for c in prev.column_names])
    got = refresh_aggregate(lake, "docs", prev_new, group_col="origin",
                            sum_cols=["n_tok"], since_seq=anchor)
    want = build_aggregate(rd.from_arrow(head),
                           group_col="origin", sum_cols=["n_tok"])
    assert got.equals(want), (
        f"incremental refresh across rename != full recompute:\n"
        f"got {got.to_pydict()}\nwant {want.to_pydict()}")


def test_refresh_aggregate_across_add_sum_column(ray_session, tmp_path):
    """A sum column is ADDED after the anchor.  Retired contributions at
    the anchor null-fill (absent == null == zero contribution), so the
    incremental refresh — with prev extended by a zero sum column, the
    caller's documented migration step — equals the full recompute."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=90, n_events=1200, seed=706,
                    ddl=[(700, "docs", "ALTER_TABLE",
                          {"add": ("stars", "string"),
                           "choices": ["1", "2", "3"]})])
    seg_files = sorted(glob.glob(os.path.join(log, "*.parquet")))
    prefix = str(tmp_path / "prefix")
    os.makedirs(prefix)
    pre_parts = []
    for f in seg_files:
        t = pq.read_table(f)
        if "ALTER_TABLE" in t["op"].to_pylist():
            break
        pre_parts.append(t)
    pre = pa.concat_tables(pre_parts)
    pq.write_table(pre, os.path.join(
        prefix, f"events-00000-{pre['seq'][0].as_py():012d}-"
                f"{pre['seq'][-1].as_py():012d}.parquet"))
    replay(ReplayConfig(event_log=prefix, lake=lake, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    anchor = pre["seq"][-1].as_py()
    prev = build_aggregate(rd.from_arrow(read_table(lake, "docs")),
                           group_col="source", sum_cols=["n_tok"])

    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    head = read_table(lake, "docs")
    assert "stars" in head.column_names
    # group by the LATE-ADDED column: prev at the anchor is one all-null
    # group holding every row (absent == null)
    prev2 = pa.table({"stars": pa.array([None], pa.string()),
                      "n_rows": pa.array(
                          [pc.sum(prev["n_rows"]).as_py()], pa.int64()),
                      "n_tok_sum": pa.array(
                          [pc.sum(prev["n_tok_sum"]).as_py()], pa.int64())})
    got = refresh_aggregate(lake, "docs", prev2, group_col="stars",
                            sum_cols=["n_tok"], since_seq=anchor)
    want = build_aggregate(rd.from_arrow(head),
                           group_col="stars", sum_cols=["n_tok"])
    assert got.equals(want), (
        f"refresh across ADD COLUMN != full recompute:\n"
        f"got {got.to_pydict()}\nwant {want.to_pydict()}")


def test_drop_column_end_to_end(ray_session, tmp_path):
    """DROP COLUMN mid-stream (the one DDL op previously untested end to
    end): the final state must lack the column and equal the oracle, a
    pre-drop time-travel anchor must still serve it, and a predicate
    read naming the dropped column must fail loudly, never silently
    return nothing."""
    import pytest

    from deltaray import snapshots

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=120, n_events=1600, seed=707,
                    segment_max_events=250,
                    ddl=[(900, "docs", "ALTER_TABLE", {"drop": "source"})])
    cfg = ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                       chunk_max_events=250, vacuum=False)
    replay(cfg)
    head = read_table(lake, "docs")
    assert "source" not in head.column_names
    want = replay_oracle(cfg)["docs"]
    assert "source" not in want.column_names
    from deltaray.oracle import tables_equal
    ok, msg = tables_equal(head, want, key="doc_id")
    assert ok, f"state after DROP COLUMN != oracle: {msg}"

    # pre-drop anchor still serves the column with its values
    anchors = snapshots(lake)
    import glob
    import os

    import pyarrow.parquet as pq

    drop_seq = None
    for f in sorted(glob.glob(os.path.join(log, "*.parquet"))):
        t = pq.read_table(f)
        hit = t.filter(pc.equal(t["op"], "ALTER_TABLE"))
        if hit.num_rows:
            drop_seq = hit["seq"][0].as_py()
            break
    pre = [a for a in anchors if a < drop_seq]
    assert pre, f"need a pre-drop anchor, snapshots={anchors}"
    asof = read_table(lake, "docs", asof_seq=pre[-1])
    assert "source" in asof.column_names
    assert asof["source"].null_count < asof.num_rows

    # predicate on the dropped column fails loudly
    with pytest.raises((KeyError, ValueError)):
        to_table(read_table_ds(lake, "docs",
                               predicate=("source", "==", "web")))

    # second replay over the same log is an idempotent no-op
    replay(cfg)
    again = read_table(lake, "docs")
    ok, msg = tables_equal(again, want, key="doc_id")
    assert ok, f"idempotent replay across DROP COLUMN: {msg}"


def test_drop_then_readd_same_column_name(ray_session, tmp_path):
    """DROP a column, then ADD a new column with the SAME name: stored
    partition files still hold the old values under that name, so a
    name-based schema unification could silently resurrect them.  Rows
    not updated after the re-add must read NULL (the new column), never
    their pre-drop values — pinned against the oracle."""
    from deltaray.oracle import tables_equal

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=120, n_events=1800, seed=708,
                    segment_max_events=300,
                    ddl=[(700, "docs", "ALTER_TABLE", {"drop": "source"}),
                         (1100, "docs", "ALTER_TABLE",
                          {"add": ("source", "string"),
                           "choices": ["x", "y"]})])
    cfg = ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                       chunk_max_events=300, vacuum=False)
    replay(cfg)
    head = read_table(lake, "docs")
    want = replay_oracle(cfg)["docs"]
    ok, msg = tables_equal(head, want, key="doc_id")
    assert ok, f"state after drop+re-add != oracle: {msg}"
    vals = set(head["source"].to_pylist())
    assert vals <= {"x", "y", None}, \
        f"pre-drop values resurrected into the re-added column: {vals}"
    assert None in vals, "expected null rows not updated since the re-add"


def test_drop_readd_across_optimize_and_reshard(ray_session, tmp_path):
    """The resurrection twin composed with the two file-rewrite paths:
    OPTIMIZE re-clusters mixed pre/post-drop files (rewrite goes through
    evolve_to, so the clustered base must carry nulls, not pre-drop
    bytes), and reshard copies raw state into a new generation evolved
    to the current schema — both must stay oracle-exact and never
    resurrect."""
    from deltaray.oracle import tables_equal

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=100, n_events=1500, seed=709,
                    segment_max_events=250,
                    ddl=[(600, "docs", "ALTER_TABLE", {"drop": "source"}),
                         (1000, "docs", "ALTER_TABLE",
                          {"add": ("source", "string"),
                           "choices": ["x", "y"]})])
    cfg = ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                       chunk_max_events=250, vacuum=False)
    replay(cfg)
    want = replay_oracle(cfg)["docs"]

    optimize_table(lake, "docs", "n_tok")
    got = read_table(lake, "docs")
    ok, msg = tables_equal(got, want, key="doc_id")
    assert ok, f"drop+re-add x OPTIMIZE: {msg}"
    assert set(got["source"].to_pylist()) <= {"x", "y", None}

    reshard_generation(lake, 7, src_generation=0, dst_generation=1)
    got1 = read_table(lake, "docs", generation=1)
    ok, msg = tables_equal(got1, want, key="doc_id")
    assert ok, f"drop+re-add x reshard: {msg}"
    assert set(got1["source"].to_pylist()) <= {"x", "y", None}


def test_feed_patch_law_across_drop_readd(ray_session, tmp_path):
    """CDC patch law across DROP + re-ADD of the same column: a
    downstream consumer anchored before the drop applies the feed PLUS
    the DDL (drop its copy of the column, add the new one null-filled —
    the documented manual-DDL chain step).  keep+DDL+upserts must then
    equal the head state exactly; in particular unchanged rows read
    NULL, the feed's upserts carry the re-added values, and the feed
    does not re-feed rows merely because the schema changed."""
    from deltaray import read_changes
    from deltaray.oracle import tables_equal
    from deltaray import snapshots

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=110, n_events=1500, seed=710,
                    segment_max_events=200,
                    ddl=[(500, "docs", "ALTER_TABLE", {"drop": "source"}),
                         (900, "docs", "ALTER_TABLE",
                          {"add": ("source", "string"),
                           "choices": ["x", "y"]})])
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=200, vacuum=False))
    anchors = snapshots(lake)
    anchor = anchors[1]
    before = read_table(lake, "docs", asof_seq=anchor)
    assert set(before["source"].to_pylist()) & {"web", "books", "code"}, \
        "anchor must be pre-drop for this probe"
    cur = read_table(lake, "docs")
    feed = to_table(read_changes(lake, "docs", since_seq=anchor))
    changed = set(feed["doc_id"].to_pylist())
    ups = feed.filter(pc.equal(feed["change"], "UPSERT")) \
        .select(cur.column_names)
    keep = before.filter(pa.array(
        [d not in changed for d in before["doc_id"].to_pylist()]))
    # downstream DDL application: drop, then re-add null-filled
    keep = keep.drop_columns(["source"]).append_column(
        "source", pa.nulls(keep.num_rows, pa.string()))
    patched = pa.concat_tables(
        [keep.select(cur.column_names), ups], promote_options="default")
    ok, msg = tables_equal(patched, cur, key="doc_id")
    assert ok, f"patch law across drop+re-add: {msg}"


def test_refresh_aggregate_sum_col_dropped_and_readded(ray_session,
                                                       tmp_path):
    """A SUM column is dropped and re-added between the anchor and the
    head (review finding): the anchor HAS a same-name column, but it is
    the dropped identity — retired contributions must null-fill, never
    subtract the pre-drop values.  prev is caller-migrated to null sums
    at the re-add (the schema-evolution step for any downstream view);
    the refresh must equal the full recompute."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=100, n_events=1500, seed=711,
                    segment_max_events=250,
                    ddl=[(500, "docs", "ALTER_TABLE", {"drop": "n_tok"}),
                         (900, "docs", "ALTER_TABLE",
                          {"add": ("n_tok", "int32")})])
    seg_files = sorted(glob.glob(os.path.join(log, "*.parquet")))
    prefix = str(tmp_path / "prefix")
    os.makedirs(prefix)
    pre_parts = []
    for f in seg_files:
        t = pq.read_table(f)
        if "ALTER_TABLE" in t["op"].to_pylist():
            break
        pre_parts.append(t)
    pre = pa.concat_tables(pre_parts)
    pq.write_table(pre, os.path.join(
        prefix, f"events-00000-{pre['seq'][0].as_py():012d}-"
                f"{pre['seq'][-1].as_py():012d}.parquet"))
    replay(ReplayConfig(event_log=prefix, lake=lake, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    anchor = pre["seq"][-1].as_py()
    prev = build_aggregate(rd.from_arrow(read_table(lake, "docs")),
                           group_col="source", sum_cols=["n_tok"])
    # caller migration at the re-add: the new identity starts all-null
    prev = prev.set_column(prev.schema.get_field_index("n_tok_sum"),
                           "n_tok_sum", pa.nulls(prev.num_rows, pa.int64()))

    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    head = read_table(lake, "docs")
    got = refresh_aggregate(lake, "docs", prev, group_col="source",
                            sum_cols=["n_tok"], since_seq=anchor)
    want = build_aggregate(rd.from_arrow(head),
                           group_col="source", sum_cols=["n_tok"])
    assert got.equals(want), (
        f"refresh with re-added sum column != full recompute:\n"
        f"got {got.to_pydict()}\nwant {want.to_pydict()}")


def test_resegmented_rereplay_is_exact(ray_session, tmp_path):
    """Replaying the SAME events re-segmented (different chunk
    boundaries) into an existing lake must stay exact — the re-applied
    overlapping chunks are LWW-idempotent by design.  Review-driven
    probe: with hi-only data-file names the overlapping delta silently
    OVERWROTE the live base file sharing its high-water mark, corrupting
    both the head state and every as-of read at that anchor (found as a
    416-vs-467-row head divergence); commit-range file names fix it."""
    import glob
    import os

    import pyarrow.parquet as pq

    from deltaray.oracle import tables_equal

    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=100, n_events=1500, seed=711,
                    segment_max_events=250)
    segs = sorted(glob.glob(os.path.join(log, "*.parquet")))
    # first replay sees the prefix as ONE coarse segment -> one chunk
    pre = pa.concat_tables([pq.read_table(f) for f in segs[:2]])
    prefix = str(tmp_path / "prefix")
    os.makedirs(prefix)
    pq.write_table(pre, os.path.join(
        prefix, f"events-00000-{pre['seq'][0].as_py():012d}-"
                f"{pre['seq'][-1].as_py():012d}.parquet"))
    replay(ReplayConfig(event_log=prefix, lake=lake, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    anchor = pre["seq"][-1].as_py()
    at_anchor = read_table(lake, "docs")

    # second replay re-reads the SAME events from finer segments:
    # overlapping chunk ranges re-apply on top of the coarse commit
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=250, vacuum=False))
    cfg_full = ReplayConfig(event_log=log, lake=lake, num_partitions=4)
    want = replay_oracle(cfg_full)["docs"]
    got = read_table(lake, "docs")
    ok, msg = tables_equal(got, want, key="doc_id")
    assert ok, f"re-segmented re-replay head state: {msg}"

    # the coarse anchor must still read back exactly
    asof = read_table(lake, "docs", asof_seq=anchor)
    ok, msg = tables_equal(asof, at_anchor, key="doc_id")
    assert ok, f"as-of at the coarse anchor after re-replay: {msg}"

    # fsck passes clean: fully-covered re-replayed chunks SKIP without
    # writing, so the re-segmented lake holds no overlapping commits at
    # all (an overlap record can only come from an extending catch-up
    # chunk, which fsck warns about rather than failing)
    from deltaray.assess import validate_lake
    rep = validate_lake(lake)
    assert rep["ok"], f"fsck errors after re-segmented re-replay: {rep['errors']}"


def test_column_epoch_units():
    """Unit pins for the DROP/re-ADD column-epoch mechanism: a file
    stamped with the pre-drop schema must null-fill under the re-added
    column regardless of merge rewrites; schema JSON round-trips the
    epoch maps; renaming onto a tombstoned name is rejected."""
    import pytest

    from deltaray.merge import evolve_to, stamp_schema
    from deltaray.schemas import TableSchema, default_table_schema

    s0 = default_table_schema("docs")
    s1 = s0.with_dropped_column("source", seq=700)
    s2 = s1.with_added_column("source", "string", seq=1100)
    assert s2.epochs == {"source": 1100}
    assert s2.tombstones == {"source": 700}

    # JSON round-trip keeps the maps
    s2b = TableSchema.from_json(s2.to_json())
    assert s2b.epochs == s2.epochs and s2b.tombstones == s2.tombstones

    # a pre-drop file: stamped s0, holds real source values
    pre = stamp_schema(pa.table({
        "doc_id": ["a", "b"], "tokens": pa.array([[1], [2]],
                                                 pa.list_(pa.int32())),
        "n_tok": pa.array([1, 1], pa.int32()),
        "source": ["web", "books"]}), s0)
    out = evolve_to(pre, s2)
    assert out["source"].null_count == 2, \
        "pre-drop values resurrected through evolve_to"
    # a post-re-add file: stamped s2, its values survive
    post = stamp_schema(pa.table({
        "doc_id": ["c"], "tokens": pa.array([[3]], pa.list_(pa.int32())),
        "n_tok": pa.array([1], pa.int32()), "source": ["x"]}), s2)
    assert evolve_to(post, s2)["source"].to_pylist() == ["x"]

    # rename onto a tombstoned name is ambiguous — rejected loudly
    with pytest.raises(ValueError, match="previously dropped"):
        s2.with_dropped_column("source", 1200) \
          .with_added_column("lang", "string", 1300) \
          .with_renamed_column("lang", "source", 1400)

    # epoch bookkeeping follows a rename of the re-added column
    s3 = s2.with_renamed_column("source", "origin", seq=1500)
    assert s3.epochs == {"origin": 1100}
    out = evolve_to(pre, s3)
    assert out["origin"].null_count == 2


def test_point_lookup_routing_after_reshard_and_optimize(ray_session,
                                                         tmp_path):
    """Key routing replays the generation's own partitioner, so point
    lookups and key-equality predicate routing must stay exact — and
    still prune partitions — after the lake reshards 4 -> 7 partitions
    and the new generation is re-clustered."""
    log, lake = str(tmp_path / "ev"), str(tmp_path / "lk")
    write_event_log(log, n_docs=300, n_events=2400, seed=705)
    replay(ReplayConfig(event_log=log, lake=lake, num_partitions=4,
                        chunk_max_events=400, vacuum=False))
    reshard_generation(lake, 7, src_generation=0, dst_generation=1)
    optimize_table(lake, "docs", "n_tok", generation=1)

    full = to_table(read_table_ds(lake, "docs", generation=1)) \
        .sort_by("doc_id")
    keys = [full["doc_id"][i].as_py()
            for i in range(0, full.num_rows, max(1, full.num_rows // 9))]
    got = read_rows(lake, "docs", keys, generation=1).sort_by("doc_id")
    want = full.filter(pc.is_in(full["doc_id"], pa.array(keys)))
    assert got.select(sorted(got.column_names)).equals(
        want.select(sorted(want.column_names)))

    # key-equality predicate routing prunes to one partition in gen 1
    io = {}
    one = to_table(read_table_ds(
        lake, "docs", generation=1,
        predicate=("doc_id", "==", keys[0]), io_stats_out=io))
    assert one.num_rows == 1
    assert io.get("parts_pruned", 0) >= 6, f"no routing pruning: {io}"
