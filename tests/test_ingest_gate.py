"""Ingest-time dedup gates: persisted index, greedy-temporal semantics,
idempotent epoch replay.  Brute-force oracles replicate the gate
semantics exactly (same MinHasher coefficients, same banding)."""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deltaray.functions.dedup import MinHasher, _union_find_drops
from deltaray.functions.ingest_gate import ExactIngestGate, MinHashIngestGate


def _docs_table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })


# ------------------------------------------------------------- exact gate
BASE = "the quick brown fox jumps over the lazy dog number %d and then some"


def _exact_epochs():
    e0 = [(1, BASE % 1), (2, BASE % 2), (3, BASE % 1),  # 3 dups 1 in-epoch
          (4, BASE % 4)]
    e1 = [(10, BASE % 2),   # dup of admitted epoch-0 doc -> rejected
          (11, BASE % 11),  # fresh
          (12, BASE % 11),  # in-epoch dup of 11
          (13, BASE % 1)]   # dup of epoch-0 -> rejected
    e2 = [(20, BASE % 11),  # dup of admitted epoch-1 doc -> rejected
          (21, BASE % 21)]
    return [e0, e1, e2]


def test_exact_gate_multi_epoch(tmp_path):
    gate = ExactIngestGate(str(tmp_path / "idx"), num_partitions=4)
    admitted = []
    for e, rows in enumerate(_exact_epochs()):
        out = gate.admit(rd.from_arrow(_docs_table(rows)), e)
        admitted.append(sorted(r["doc_id"] for r in out.take_all()))
    assert admitted == [[1, 2, 4], [11], [21]]


def test_exact_gate_replay_idempotent(tmp_path):
    gate = ExactIngestGate(str(tmp_path / "idx"), num_partitions=4)
    epochs = _exact_epochs()
    gate.admit(rd.from_arrow(_docs_table(epochs[0])), 0).count()
    first = sorted(r["doc_id"] for r in
                   gate.admit(rd.from_arrow(_docs_table(epochs[1])), 1).take_all())

    def index_files(root):
        return sorted(os.path.join(d, f) for d, _, fs in os.walk(root)
                      for f in fs)

    snap = index_files(str(tmp_path / "idx"))
    # replaying epoch 1 (retry / resume): same admitted rows, no new files
    again = sorted(r["doc_id"] for r in
                   gate.admit(rd.from_arrow(_docs_table(epochs[1])), 1).take_all())
    assert again == first == [11]
    assert index_files(str(tmp_path / "idx")) == snap
    # and epoch 2 still sees a consistent index
    out2 = sorted(r["doc_id"] for r in
                  gate.admit(rd.from_arrow(_docs_table(epochs[2])), 2).take_all())
    assert out2 == [21]


def test_exact_gate_preserves_columns(tmp_path):
    gate = ExactIngestGate(str(tmp_path / "idx"), num_partitions=2)
    tbl = _docs_table([(1, "aaa bbb ccc ddd"), (2, "eee fff ggg hhh")])
    tbl = tbl.append_column("lang", pa.array(["en", "de"]))
    out = gate.admit(rd.from_arrow(tbl), 0)
    got = out.take_all()
    assert sorted(got[0].keys()) == ["doc_id", "lang", "text"]
    assert sorted(r["lang"] for r in got) == ["de", "en"]


# ----------------------------------------------------------- minhash gate
def _corpus(rng, n, n_neardup_groups, seed_texts=None):
    """Docs with planted near-dup groups: group members share a long base
    text with a few word edits (Jaccard ~0.8-0.95); the rest are random
    word soup (Jaccard ~0)."""
    words = [f"w{i:03d}" for i in range(400)]
    rows = []
    did = 0
    bases = []
    for g in range(n_neardup_groups):
        base = " ".join(rng.choice(words, size=80))
        bases.append(base)
    gi = 0
    for i in range(n):
        if gi < len(bases) and i % 4 == 0:
            toks = bases[gi].split()
            for _ in range(rng.integers(0, 3)):
                toks[rng.integers(len(toks))] = str(rng.choice(words))
            rows.append((did, " ".join(toks)))
            if i % 8 == 4:
                gi += 1
        else:
            rows.append((did, " ".join(rng.choice(words, size=60))))
        did += 1
    return rows


def _oracle_gate(epochs, *, num_hashes=64, bands=16, shingle_k=5, seed=42,
                 threshold=0.5):
    """Brute-force greedy-temporal gate: identical MinHash coefficients,
    identical banding; membership vs ADMITTED docs only."""
    hasher = MinHasher(num_hashes=num_hashes, seed=seed, shingle_k=shingle_k)
    rpb = num_hashes // bands
    index = {}  # doc_id -> sig (admitted only)
    admitted_per_epoch = []

    def bandkeys(sig):
        return [tuple(sig[b * rpb:(b + 1) * rpb]) for b in range(bands)]

    for rows in epochs:
        ids = [r[0] for r in rows]
        sigs = hasher.signatures([r[1] for r in rows])
        rejected = set()
        for i, d in enumerate(ids):
            bk = set(bandkeys(sigs[i]))
            for oid, osig in index.items():
                if bk & set(bandkeys(osig)):
                    est = (sigs[i] == osig).mean()
                    if est >= threshold:
                        rejected.add(d)
                        break
        # within-epoch: edges among index-survivors sharing a band
        edges = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] in rejected or ids[j] in rejected:
                    continue
                if set(bandkeys(sigs[i])) & set(bandkeys(sigs[j])):
                    if (sigs[i] == sigs[j]).mean() >= threshold:
                        edges.append((ids[i], ids[j]))
        drop = _union_find_drops(iter(edges))
        adm = [d for d in ids if d not in rejected and d not in drop]
        admitted_per_epoch.append(sorted(adm))
        for i, d in enumerate(ids):
            if d in adm:
                index[d] = sigs[i]
    return admitted_per_epoch


def test_minhash_gate_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(7)
    all_rows = _corpus(rng, 48, 4)
    epochs = [all_rows[:16], all_rows[16:32], all_rows[32:]]
    expected = _oracle_gate(epochs)
    # sanity: the corpus actually plants cross-epoch near-dups
    n_rejected = sum(len(e) for e in epochs) - sum(len(a) for a in expected)
    assert n_rejected >= 2

    gate = MinHashIngestGate(str(tmp_path / "idx"), num_partitions=4)
    got = []
    for e, rows in enumerate(epochs):
        stats = {}
        out = gate.admit(rd.from_arrow(_docs_table(rows)), e,
                         stats_out=stats)
        got.append(sorted(r["doc_id"] for r in out.take_all()))
    assert got == expected


def test_minhash_gate_replay_idempotent(tmp_path):
    rng = np.random.default_rng(11)
    all_rows = _corpus(rng, 32, 3)
    epochs = [all_rows[:16], all_rows[16:]]
    gate = MinHashIngestGate(str(tmp_path / "idx"), num_partitions=4)
    gate.admit(rd.from_arrow(_docs_table(epochs[0])), 0).count()
    first = sorted(r["doc_id"] for r in
                   gate.admit(rd.from_arrow(_docs_table(epochs[1])), 1).take_all())

    def index_files(root):
        return sorted(os.path.join(d, f) for d, _, fs in os.walk(root)
                      for f in fs)

    snap = index_files(str(tmp_path / "idx"))
    again = sorted(r["doc_id"] for r in
                   gate.admit(rd.from_arrow(_docs_table(epochs[1])), 1).take_all())
    assert again == first
    assert index_files(str(tmp_path / "idx")) == snap


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_minhash_gate_property_soak(data, tmp_path_factory):
    """Multi-epoch soak: random corpora, random epoch cuts, random
    partition counts all reproduce the brute-force greedy-temporal
    oracle exactly (round-3 verdict follow-up)."""
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    n = data.draw(st.integers(12, 80), label="n_docs")
    groups = data.draw(st.integers(1, 6), label="neardup_groups")
    n_epochs = data.draw(st.integers(2, 4), label="n_epochs")
    parts = data.draw(st.sampled_from([1, 2, 4, 7]), label="partitions")
    rng = np.random.default_rng(seed)
    rows = _corpus(rng, n, groups)
    cuts = sorted(data.draw(
        st.lists(st.integers(1, n - 1), min_size=n_epochs - 1,
                 max_size=n_epochs - 1, unique=True), label="cuts"))
    epochs = [rows[a:b] for a, b in zip([0] + cuts, cuts + [n])]
    epochs = [e for e in epochs if e]
    expected = _oracle_gate(epochs)
    base = tmp_path_factory.mktemp("gate_soak")
    gate = MinHashIngestGate(str(base / "idx"), num_partitions=parts)
    got = [sorted(r["doc_id"] for r in
                  gate.admit(rd.from_arrow(_docs_table(e)), i).take_all())
           for i, e in enumerate(epochs)]
    assert got == expected


def test_minhash_gate_star_cap_flood(tmp_path):
    """An identical-signature flood larger than max_bucket is resolved
    exactly by the min-id star: one representative admitted in the flood
    epoch, every later copy rejected against the persisted index."""
    text = "identical flood document with enough length to shingle " * 3
    flood = [(i, text) for i in range(20)]
    gate = MinHashIngestGate(str(tmp_path / "idx"), num_partitions=2,
                             max_bucket=4)
    got0 = sorted(r["doc_id"] for r in
                  gate.admit(rd.from_arrow(_docs_table(flood)), 0).take_all())
    assert got0 == [0]
    got1 = gate.admit(
        rd.from_arrow(_docs_table([(100, text), (101, text)])), 1).take_all()
    assert got1 == []


def test_gate_meta_pin(tmp_path):
    """Reopening a persisted gate index with different layout/hash
    parameters fails fast instead of silently mis-routing probes."""
    root = str(tmp_path / "idx")
    gate = MinHashIngestGate(root, num_partitions=4)
    gate.admit(rd.from_arrow(_docs_table([(1, BASE % 1)])), 0).count()
    with pytest.raises(ValueError, match="different parameters"):
        MinHashIngestGate(root, num_partitions=8)
    with pytest.raises(ValueError, match="different parameters"):
        MinHashIngestGate(root, seed=7)
    # same parameters reopen fine
    MinHashIngestGate(root, num_partitions=4)
    eroot = str(tmp_path / "eidx")
    ExactIngestGate(eroot, num_partitions=4)
    with pytest.raises(ValueError, match="different parameters"):
        ExactIngestGate(eroot, num_partitions=2)


def test_minhash_gate_rejected_not_indexed(tmp_path):
    """A doc matching only a REJECTED doc is admitted (the admitted set
    is the representative set)."""
    words = [f"t{i}" for i in range(300)]
    rng = np.random.default_rng(3)
    a = " ".join(rng.choice(words, size=100))
    toks = a.split()
    toks[5] = "zzz"
    b = " ".join(toks)  # near-dup of a
    gate = MinHashIngestGate(str(tmp_path / "idx"), num_partitions=2)
    got0 = gate.admit(rd.from_arrow(_docs_table([(1, a)])), 0).take_all()
    assert [r["doc_id"] for r in got0] == [1]
    # b rejected vs admitted a
    got1 = gate.admit(rd.from_arrow(_docs_table([(2, b)])), 1).take_all()
    assert got1 == []
    # replaying b in a later epoch is STILL rejected (a remains indexed);
    # and a's exact twin too
    got2 = gate.admit(rd.from_arrow(_docs_table([(3, b), (4, a)])), 2).take_all()
    assert got2 == []


def test_dedup_spans_matches_bruteforce(ray_session):
    """dedup_spans == a single-process reimplementation of the same
    rule (global-first-occurrence keeper, merged-span excision) on a
    corpus with planted boilerplate, self-repeats, short and empty
    docs — exact text equality per doc."""
    import numpy as np
    import ray.data

    from deltaray.functions.dedup import dedup_spans
    from deltaray.util import to_table

    K = 4
    rng = np.random.default_rng(11)

    def rand_toks(n):
        return [f"w{int(x)}" for x in rng.integers(0, 40, n)]

    boiler = ["the", "quick", "brown", "fox", "jumps"]
    docs = {}
    for i in range(30):
        body = rand_toks(int(rng.integers(0, 25)))
        if i % 3 == 0:
            p = int(rng.integers(0, max(1, len(body))))
            body = body[:p] + boiler + body[p:]
        docs[f"d{i:03d}"] = body
    docs["empty"] = []
    docs["short"] = ["a", "b"]
    docs["selfrep"] = ["x", "y", "z", "q"] * 4

    def brute(docs, k):
        occ: dict = {}
        for d in sorted(docs):
            t = docs[d]
            for p in range(max(0, len(t) - k + 1)):
                occ.setdefault(tuple(t[p:p + k]), []).append((d, p))
        removals: dict = {}
        for w, os_ in occ.items():
            if len(os_) < 2:
                continue
            keeper = min(os_)
            for d, p in os_:
                if (d, p) != keeper:
                    removals.setdefault(d, []).append(p)
        out = {}
        for d in sorted(docs):
            t = docs[d]
            drop = np.zeros(len(t) + 1, dtype=int)
            for p in removals.get(d, []):
                drop[p] += 1
                drop[min(p + k, len(t))] -= 1
            mask = (np.cumsum(drop[:-1]) == 0 if len(t)
                    else np.array([], bool))
            kept = [tok for tok, m in zip(t, mask) if m]
            n_spans, prev = 0, False
            for m in (~mask if len(t) else []):
                if m and not prev:
                    n_spans += 1
                prev = m
            out[d] = (" ".join(kept), len(t), len(kept), n_spans)
        return out

    tbl = pa.table({
        "doc_id": pa.array(sorted(docs)),
        "text": pa.array([" ".join(docs[d]) for d in sorted(docs)])})
    stats: dict = {}
    got = to_table(dedup_spans(
        ray.data.from_arrow(tbl).repartition(4), k=K, num_partitions=5,
        stats_out=stats)).to_pandas().set_index("doc_id").sort_index()
    want = brute(docs, K)
    assert len(got) == len(want)
    for d, (txt, nb, na, ns) in want.items():
        row = got.loc[d]
        assert (row["text"], row["n_tok_before"], row["n_tok_after"],
                row["n_spans_removed"]) == (txt, nb, na, ns), d
    assert stats["dup_window_hashes"] > 0


def test_dedup_spans_tokens_mode_matches_bruteforce(ray_session):
    """tokens_col mode (pre-tokenized list<int32> lake payload) == the
    same brute-force rule, including the regression where a zero-length
    doc at the end of a partition block silently shortened the previous
    doc's kept segment (np.add.reduceat empty-trailing-segment trap)."""
    import numpy as np
    import ray.data

    from deltaray.functions.dedup import dedup_spans
    from deltaray.util import to_table

    K = 4
    rng = np.random.default_rng(21)
    boiler = [901, 902, 903, 904, 905]
    docs = {}
    for i in range(30):
        body = [int(x) for x in rng.integers(0, 50, int(rng.integers(0, 25)))]
        if i % 3 == 0:
            p = int(rng.integers(0, max(1, len(body))))
            body = body[:p] + boiler + body[p:]
        docs[f"d{i:03d}"] = body
    docs["empty"] = []          # zero-length doc: the reduceat trap
    docs["selfrep"] = [7, 8, 9, 10] * 4

    def brute(docs, k):
        occ: dict = {}
        for d in sorted(docs):
            t = docs[d]
            for p in range(max(0, len(t) - k + 1)):
                occ.setdefault(tuple(t[p:p + k]), []).append((d, p))
        removals: dict = {}
        for w, os_ in occ.items():
            if len(os_) < 2:
                continue
            keeper = min(os_)
            for d, p in os_:
                if (d, p) != keeper:
                    removals.setdefault(d, []).append(p)
        out = {}
        for d in sorted(docs):
            t = docs[d]
            drop = np.zeros(len(t) + 1, dtype=int)
            for p in removals.get(d, []):
                drop[p] += 1
                drop[min(p + k, len(t))] -= 1
            mask = (np.cumsum(drop[:-1]) == 0 if len(t)
                    else np.array([], bool))
            out[d] = [tok for tok, m in zip(t, mask) if m]
        return out

    tbl = pa.table({
        "doc_id": pa.array(sorted(docs)),
        "tokens": pa.array([docs[d] for d in sorted(docs)],
                           pa.list_(pa.int32()))})
    got = to_table(dedup_spans(
        ray.data.from_arrow(tbl).repartition(4), k=K, tokens_col="tokens",
        num_partitions=5)).to_pandas().set_index("doc_id").sort_index()
    want = brute(docs, K)
    for d, kept in want.items():
        row = got.loc[d]
        assert list(row["tokens"]) == kept, d
        assert row["n_tok_after"] == len(kept), d
        assert row["n_tok_before"] == len(docs[d]), d


def test_dedup_spans_semi_join_path(ray_session):
    """broadcast_cap=0 forces the big-dup-volume semi-join path; results
    must match the broadcast path exactly."""
    import numpy as np
    import ray.data

    from deltaray.functions.dedup import dedup_spans
    from deltaray.util import to_pandas

    rng = np.random.default_rng(3)
    docs = {f"d{i:02d}": [int(x) for x in rng.integers(0, 8, 20)]
            for i in range(12)}
    tbl = pa.table({"doc_id": pa.array(sorted(docs)),
                    "tokens": pa.array([docs[d] for d in sorted(docs)],
                                       pa.list_(pa.int32()))})
    outs = {}
    for cap in (10**6, 0):
        stats: dict = {}
        outs[cap] = to_pandas(dedup_spans(
            ray.data.from_arrow(tbl).repartition(3), k=3,
            tokens_col="tokens", num_partitions=4, broadcast_cap=cap,
            stats_out=stats)).set_index("doc_id").sort_index()
        assert stats["path"] == ("broadcast" if cap else "semi_join")
        assert stats["dup_window_hashes"] > 0
    for d in sorted(docs):
        assert (list(outs[10**6].loc[d]["tokens"])
                == list(outs[0].loc[d]["tokens"])), d


def test_dedup_spans_multi_pass_junction_dups(ray_session):
    """Excising a span splices its neighbors; the junction windows can
    be NEW duplicates that only a second pass catches.  passes=3 must
    match the brute-force rule iterated to a fixed point, keep
    n_tok_before at the ORIGINAL count, accumulate n_spans_removed,
    and early-stop once a pass finds nothing."""
    import numpy as np
    import ray.data

    from deltaray.functions.dedup import dedup_spans
    from deltaray.util import to_pandas

    K = 3
    boiler = [70, 71, 72]
    docs = {
        "a": boiler + [80, 81],            # boiler keeper
        "b": [10, 11] + boiler + [12, 13],  # junction forms (10,11,12)
        "c": [10, 11, 12, 13, 60],          # the junction's duplicate
        "d": [50, 51, 52, 53],
    }

    def brute_once(state, k):
        occ: dict = {}
        for d in sorted(state):
            t = state[d]
            for p in range(max(0, len(t) - k + 1)):
                occ.setdefault(tuple(t[p:p + k]), []).append((d, p))
        removals: dict = {}
        for w, os_ in occ.items():
            if len(os_) < 2:
                continue
            keeper = min(os_)
            for dd, p in os_:
                if (dd, p) != keeper:
                    removals.setdefault(dd, []).append(p)
        out = {}
        for d in sorted(state):
            t = state[d]
            drop = np.zeros(len(t) + 1, dtype=int)
            for p in removals.get(d, []):
                drop[p] += 1
                drop[min(p + k, len(t))] -= 1
            mask = (np.cumsum(drop[:-1]) == 0 if len(t)
                    else np.array([], bool))
            out[d] = [tok for tok, m in zip(t, mask) if m]
        return out

    state = dict(docs)
    for _ in range(3):
        state = brute_once(state, K)
    # sanity: this corpus NEEDS a second pass — the junction windows in
    # post-pass-1 "b" dup against "c", and "b" wins the keeper race, so
    # the second pass excises from "c"
    assert brute_once(dict(docs), K)["c"] != state["c"]

    tbl = pa.table({"doc_id": pa.array(sorted(docs)),
                    "tokens": pa.array([docs[d] for d in sorted(docs)],
                                       pa.list_(pa.int32()))})
    stats: dict = {}
    got = to_pandas(dedup_spans(
        ray.data.from_arrow(tbl).repartition(2), k=K, tokens_col="tokens",
        num_partitions=3, passes=3, stats_out=stats)) \
        .set_index("doc_id").sort_index()
    assert len(stats["dup_per_pass"]) >= 2
    assert stats["dup_per_pass"][0] > 0 and stats["dup_per_pass"][1] > 0
    for d in sorted(docs):
        assert list(got.loc[d]["tokens"]) == state[d], d
        assert got.loc[d]["n_tok_before"] == len(docs[d]), d
    # spans accumulate across passes: "c" is untouched in pass 1 and
    # excised in pass 2
    assert got.loc["c"]["n_spans_removed"] >= 1
    assert got.loc["b"]["n_spans_removed"] >= 1


def test_exact_gate_admit_blocks_until_persisted(ray_session, tmp_path):
    """Structural pin for the epoch-race fix: admit() must return a
    MATERIALIZED dataset (index writes are side effects of the merge
    tasks — a lazy return would let epoch E+1's membership probe race
    epoch E's writes)."""
    import ray.data
    from ray.data.dataset import MaterializedDataset

    from deltaray.functions.ingest_gate import ExactIngestGate

    gate = ExactIngestGate(str(tmp_path / "idx"), num_partitions=2)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aa", "bb"])}))
    out = gate.admit(ds, 0)
    assert isinstance(out, MaterializedDataset)
    # and the persistence is already on disk when admit returns
    import glob
    assert glob.glob(str(tmp_path / "idx" / "**" / "*.parquet"),
                     recursive=True)


# ------------------------------------------------------------- compaction
def test_exact_gate_compaction_soak(tmp_path):
    """50-epoch soak against one persisted index (round-3 verdict ask):
    live file count per partition stays O(compact_threshold) instead of
    O(epochs), compacted runs replace the epoch files, zone-map pruning
    makes the membership read volume sub-linear in the index size, a
    replayed admit after compaction is still idempotent, and every
    epoch's admitted set matches the greedy-temporal oracle."""
    from deltaray.functions.ingest_gate import (READ_STATS, _live_state,
                                                _read_index,
                                                reset_read_stats)
    from deltaray.transforms import stable_hash_strings

    P, THRESH = 2, 4
    root = str(tmp_path / "idx")
    gate = ExactIngestGate(root, num_partitions=P, compact_threshold=THRESH,
                           run_row_group_size=32)
    fp_dir = os.path.join(root, "fp")
    rng = np.random.default_rng(3)
    admitted_texts: list[str] = []
    seen: set[str] = set()
    did = 0
    max_live = 0
    last_rows = None
    for e in range(50):
        rows = []
        for _ in range(40):
            if admitted_texts and rng.random() < 0.3:
                txt = admitted_texts[rng.integers(len(admitted_texts))]
            else:
                txt = BASE % did + f" fresh {did}"
            rows.append((did, txt))
            did += 1
        exp, batch_first = [], set()
        for d, t in rows:
            if t in seen or t in batch_first:
                continue
            batch_first.add(t)
            exp.append(d)
        out = gate.admit(rd.from_arrow(_docs_table(rows)), e)
        got = sorted(r["doc_id"] for r in out.take_all())
        assert got == sorted(exp), f"epoch {e}: {got} != {sorted(exp)}"
        seen.update(batch_first)
        admitted_texts.extend(sorted(batch_first))
        last_rows = rows
        for p in range(P):
            pdir = os.path.join(fp_dir, f"part={p:05d}")
            n_live = len([f for f in os.listdir(pdir)
                          if f.endswith(".parquet")])
            max_live = max(max_live, n_live)
    # bounded: without compaction this reaches 50 files per partition
    assert max_live <= THRESH + 1, max_live
    for p in range(P):
        run, tail = _live_state(fp_dir, p, 50)
        assert run is not None
        assert len(tail) <= THRESH
    # replayed admit of the last epoch AFTER compaction: same rows, no
    # new files (the run contains epoch 49's rows; the epoch filter must
    # exclude them from its own membership probe)
    def index_files():
        return sorted(os.path.join(d, f) for d, _, fs in os.walk(root)
                      for f in fs)

    snap = index_files()
    gate2 = ExactIngestGate(root, num_partitions=P,
                            compact_threshold=THRESH, run_row_group_size=32)
    exp_last = []
    # recompute the oracle for epoch 49 against the pre-49 state
    seen_pre = set()
    rng2 = np.random.default_rng(3)
    texts_pre: list[str] = []
    d2 = 0
    for e in range(49):
        batch = set()
        for _ in range(40):
            if texts_pre and rng2.random() < 0.3:
                t = texts_pre[rng2.integers(len(texts_pre))]
            else:
                t = BASE % d2 + f" fresh {d2}"
            if t not in seen_pre:
                batch.add(t)
            d2 += 1
        seen_pre.update(batch)
        texts_pre.extend(sorted(batch))
    batch_first = set()
    for d, t in last_rows:
        if t in seen_pre or t in batch_first:
            continue
        batch_first.add(t)
        exp_last.append(d)
    again = sorted(r["doc_id"] for r in gate2.admit(
        rd.from_arrow(_docs_table(last_rows)), 49).take_all())
    assert again == sorted(exp_last)
    assert index_files() == snap
    # sub-linear membership read: a small probe against the full index
    # reads a fraction of the index rows (zone-map row-group pruning)
    reset_read_stats()
    probes = [admitted_texts[i] for i in
              range(0, len(admitted_texts), max(1, len(admitted_texts) // 5))][:5]
    fps = stable_hash_strings(pa.array(probes, pa.string())).astype(np.int64)
    total_index_rows = len(admitted_texts)
    read_rows_total = 0
    for p in range(P):
        t = _read_index(fp_dir, p, 50, ["fp"], probe_col="fp", probe=fps)
        assert t is not None
        read_rows_total += t.num_rows
    assert READ_STATS["row_groups_read"] < 0.6 * READ_STATS["row_groups_total"]
    assert read_rows_total < 0.6 * total_index_rows, (
        read_rows_total, total_index_rows)


def test_minhash_gate_compaction_matches_oracle(tmp_path):
    """MinHash gate under aggressive compaction (threshold 2 forces run
    rewrites on both the band and sig indexes across 8 epochs) still
    reproduces the brute-force greedy-temporal oracle exactly, and the
    band/sig partitions keep a bounded live file count."""
    rng = np.random.default_rng(19)
    all_rows = _corpus(rng, 96, 8)
    epochs = [all_rows[i * 12:(i + 1) * 12] for i in range(8)]
    expected = _oracle_gate(epochs)
    assert sum(len(e) for e in epochs) - sum(len(a) for a in expected) >= 2
    root = str(tmp_path / "idx")
    gate = MinHashIngestGate(root, num_partitions=2, compact_threshold=2,
                             run_row_group_size=64)
    got = [sorted(r["doc_id"] for r in
                  gate.admit(rd.from_arrow(_docs_table(e)), i).take_all())
           for i, e in enumerate(epochs)]
    assert got == expected
    for sub in ("bands", "sigs"):
        for p in range(2):
            pdir = os.path.join(root, sub, f"part={p:05d}")
            if not os.path.isdir(pdir):
                continue
            live = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            assert len(live) <= 4, (sub, p, live)
            assert any(f.startswith("run-") for f in live), (sub, p, live)


# -------------------------------------------------------- embedding gate
def _vec_corpus(rng, n, n_groups, dim=32):
    """Vectors with planted near-dup groups (base + tiny noise, cosine
    ~0.99); the rest are independent Gaussians (cosine ~0 at dim 32)."""
    rows = []
    bases = [rng.standard_normal(dim) for _ in range(n_groups)]
    gi = 0
    for i in range(n):
        if gi < len(bases) and i % 4 == 0:
            v = bases[gi] + 0.05 * rng.standard_normal(dim)
            if i % 8 == 4:
                gi += 1
        else:
            v = rng.standard_normal(dim)
        rows.append((i, (v / np.linalg.norm(v)).astype(np.float32)))
    return rows


def _vec_table(rows):
    return pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1].tolist() for r in rows],
                              pa.list_(pa.float32())),
    })


def _emb_oracle(epochs, gate):
    """Brute-force greedy-temporal gate with the SAME LSH tables and the
    exact-cosine verify: rejected iff some admitted vector shares a
    bucket and has cosine >= threshold; within-epoch survivors cluster
    by union-find and keep the min id."""
    planes, thr = gate.planes, gate.threshold
    weights = np.uint64(1) << np.arange(gate.n_planes, dtype=np.uint64)

    def buckets(v):
        out = set()
        for t in range(gate.n_tables):
            bits = ((v @ planes[t].T) > 0).astype(np.uint64)
            out.add((t, int((bits @ weights).astype(np.int64))))
        return out

    index = {}
    admitted_per_epoch = []
    for rows in epochs:
        ids = [r[0] for r in rows]
        vecs = {r[0]: r[1] / np.linalg.norm(r[1]) for r in rows}
        bks = {d: buckets(vecs[d]) for d in ids}
        rejected = set()
        for d in ids:
            for oid, ov in index.items():
                if bks[d] & buckets(ov) and float(vecs[d] @ ov) >= thr:
                    rejected.add(d)
                    break
        edges = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                if a in rejected or b in rejected:
                    continue
                if bks[a] & bks[b] and float(vecs[a] @ vecs[b]) >= thr:
                    edges.append((a, b))
        drop = _union_find_drops(iter(edges))
        adm = [d for d in ids if d not in rejected and d not in drop]
        admitted_per_epoch.append(sorted(adm))
        for d in adm:
            index[d] = vecs[d]
    return admitted_per_epoch


def test_embedding_gate_matches_bruteforce(tmp_path):
    from deltaray.functions.ingest_gate import EmbeddingIngestGate

    rng = np.random.default_rng(41)
    all_rows = _vec_corpus(rng, 48, 4)
    epochs = [all_rows[:16], all_rows[16:32], all_rows[32:]]
    gate = EmbeddingIngestGate(str(tmp_path / "idx"), dim=32,
                               num_partitions=4, cosine_threshold=0.9)
    expected = _emb_oracle(epochs, gate)
    n_rejected = sum(len(e) for e in epochs) - sum(len(a) for a in expected)
    assert n_rejected >= 2  # the corpus really plants cross-epoch dups
    got = []
    for e, rows in enumerate(epochs):
        stats = {}
        out = gate.admit(rd.from_arrow(_vec_table(rows)), e,
                         stats_out=stats)
        got.append(sorted(r["vec_id"] for r in out.take_all()))
    assert got == expected


def test_embedding_gate_replay_and_compaction(tmp_path):
    from deltaray.functions.ingest_gate import EmbeddingIngestGate

    rng = np.random.default_rng(43)
    all_rows = _vec_corpus(rng, 60, 5)
    epochs = [all_rows[i * 10:(i + 1) * 10] for i in range(6)]
    root = str(tmp_path / "idx")
    gate = EmbeddingIngestGate(root, dim=32, num_partitions=2,
                               cosine_threshold=0.9, compact_threshold=2,
                               run_row_group_size=64)
    expected = _emb_oracle(epochs, gate)
    got = []
    for e, rows in enumerate(epochs[:-1]):
        got.append(sorted(r["vec_id"] for r in
                          gate.admit(rd.from_arrow(_vec_table(rows)),
                                     e).take_all()))

    def index_files():
        return sorted(os.path.join(d, f) for d, _, fs in os.walk(root)
                      for f in fs)

    # last epoch: run, snapshot, replay — identical rows, no new files
    last = sorted(r["vec_id"] for r in gate.admit(
        rd.from_arrow(_vec_table(epochs[-1])), 5).take_all())
    snap = index_files()
    again = sorted(r["vec_id"] for r in gate.admit(
        rd.from_arrow(_vec_table(epochs[-1])), 5).take_all())
    assert got + [last] == expected
    assert again == last
    assert index_files() == snap
    # compaction really ran on both indexes
    for sub in ("bands", "sigs"):
        for p in range(2):
            pdir = os.path.join(root, sub, f"part={p:05d}")
            if os.path.isdir(pdir):
                live = [f for f in os.listdir(pdir)
                        if f.endswith(".parquet")]
                assert len(live) <= 4, (sub, p, live)
    # meta pin
    with pytest.raises(ValueError, match="different parameters"):
        EmbeddingIngestGate(root, dim=32, num_partitions=4)
