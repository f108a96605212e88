"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: exact cosine top-k — the (small) query matrix
  ships in the serialized task closure once per worker process, numpy
  matmul per batch (never per row), partial top-k per batch, final
  top-k reduction on the tiny candidate set.
- ``knn_ivf``: IVF-style scale path — k-means-ish coarse centroids
  (sampled, trained once on the driver), each vector assigned to its
  nearest centroid inside ``map_batches``; queries probe only the
  ``nprobe`` nearest centroid partitions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


def vecs_np(col, dtype=np.float64) -> np.ndarray:
    """Zero-copy list<float> column → (n, dim) numpy matrix.

    Embeddings are fixed-dimension, null-free lists, so the flat values
    buffer reshapes directly — no per-row Python objects (the old
    ``to_pylist()`` path built O(rows × dim) PyFloats in every hot
    batch).  ``flatten()`` honors list-array offsets; the cast is a
    no-op when the storage type already matches ``dtype``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    vals = col.flatten().to_numpy(zero_copy_only=False)
    dim = vals.size // n
    if dim * n != vals.size:  # ragged lists — not an embedding column
        raise ValueError(f"ragged list column: {vals.size} values / {n} rows")
    return np.ascontiguousarray(vals.reshape(n, dim)).astype(dtype, copy=False)


def knn_bruteforce(ds, queries: np.ndarray, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k of each query against the whole dataset.

    Returns pa.Table (query_id, rank, vec_id, cosine) sorted by
    (query_id, rank).  The dataset streams; only ``n_queries × k``
    candidates per batch come back to the reducer.
    """
    q = _unit(np.asarray(queries, dtype=np.float64))

    def score(batch: pa.Table) -> pa.Table:
        # task-pool stage: the (small) query matrix ships inside the
        # serialized function ONCE per worker process — parallelism follows
        # block count with zero actor-spawn cost (actor pools here paid
        # ~0.5-1s spawn per actor on short inputs, measured)
        vecs = _unit(vecs_np(batch[vec_col], np.float64))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sim = q @ vecs.T  # (nq, nb)
        kk = min(k, sim.shape[1])
        top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        nq = sim.shape[0]
        qid = np.repeat(np.arange(nq, dtype=np.int64), kk)
        vid = ids[top.ravel()]
        cs = sim[np.repeat(np.arange(nq), kk), top.ravel()]
        return pa.table(
            {
                "query_id": pa.array(qid),
                id_col: pa.array(vid.astype(np.int64)),
                "cosine": pa.array(cs.astype(np.float64)),
            }
        )

    cands = ds.map_batches(score, batch_format="pyarrow")
    # final reduction over the small candidate set (nq × k × n_batches rows)
    from deltaray.util import to_table

    # empty-safe: zero candidate batches (e.g. no probed LSH bucket hit
    # any corpus vector) must yield the typed empty result, not a
    # concat_tables ValueError
    tbl = to_table(cands)
    return _topk_reduce(tbl, k, id_col)


def _topk_reduce(tbl: pa.Table, k: int, id_col: str) -> pa.Table:
    """Vectorized final top-k per query over the (small) candidate union:
    one sort + factorize + repeat/arange gather (the ``top_k_per_key``
    pattern) — no pandas, no per-row Python, so thousands of queries stay
    cheap."""
    from deltaray.functions.partition import group_codes

    if tbl.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    g = tbl.sort_by([("query_id", "ascending"), ("cosine", "descending"),
                     (id_col, "ascending")])
    codes = group_codes(g, ["query_id"])
    _, first, counts = np.unique(codes, return_index=True, return_counts=True)
    take = np.minimum(counts, k)
    starts = np.repeat(first, take)
    within = np.arange(int(take.sum())) - np.repeat(np.cumsum(take) - take, take)
    sel = g.take(pa.array(starts + within))
    return pa.table({
        "query_id": sel["query_id"],
        "rank": pa.array((within + 1).astype(np.int64)),
        id_col: sel[id_col],
        "cosine": sel["cosine"],
    })


def train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8,
                    seed: int = 42) -> np.ndarray:
    """Mini k-means on a driver-side sample (the IVF coarse quantizer)."""
    rng = np.random.default_rng(seed)
    X = _unit(np.asarray(sample, dtype=np.float32))
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _unit(C)
    return C


def knn_ivf(ds, queries: np.ndarray, centroids: np.ndarray, k: int = 5,
            nprobe: int = 4, id_col: str = "vec_id",
            vec_col: str = "embedding") -> pa.Table:
    """IVF top-k: score only vectors whose coarse cell is among each
    query's ``nprobe`` nearest cells.  Centroids + queries broadcast once."""
    q = _unit(np.asarray(queries, dtype=np.float32))
    C = _unit(np.asarray(centroids, dtype=np.float32))
    probe = np.argsort(-(q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cell_queries: dict[int, list[int]] = {}
    for qi, cells_ in enumerate(probe):
        for c in cells_:
            cell_queries.setdefault(int(c), []).append(qi)

    def score(batch: pa.Table) -> pa.Table:
        # task-pool stage; (q, C, probe map) ship in the serialized fn once
        vecs = _unit(vecs_np(batch[vec_col], np.float32))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cells = (vecs @ C.T).argmax(axis=1)
        out_q, out_i, out_c = [], [], []
        for c in np.unique(cells):
            qs = cell_queries.get(int(c))
            if not qs:
                continue
            m = cells == c
            sub, sids = vecs[m], ids[m]
            sim = q[qs] @ sub.T
            kk = min(k, sim.shape[1])
            top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
            for row, qi in enumerate(qs):
                out_q.extend([qi] * kk)
                out_i.extend(sids[top[row]].tolist())
                out_c.extend(sim[row, top[row]].tolist())
        return pa.table(
            {
                "query_id": pa.array(np.array(out_q, dtype=np.int64)),
                id_col: pa.array(np.array(out_i, dtype=np.int64)),
                "cosine": pa.array(np.array(out_c, dtype=np.float64)),
            }
        )

    cands = ds.map_batches(score, batch_format="pyarrow")
    from deltaray.util import to_table

    # empty-safe: zero candidate batches (e.g. no probed LSH bucket hit
    # any corpus vector) must yield the typed empty result, not a
    # concat_tables ValueError
    tbl = to_table(cands)
    return _topk_reduce(tbl, k, id_col)


def lsh_planes(dim: int, n_tables: int, n_bits: int,
               seed: int = 42) -> np.ndarray:
    """Random hyperplane tables for cosine LSH: (n_tables, n_bits, dim)
    Gaussian normals (SimHash/hyperplane LSH, Charikar STOC'02)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim)).astype(np.float32)


def _lsh_codes(V: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bucket code of each vector under each table → (n, n_tables) int64.
    One matmul against the flattened plane stack; sign bits pack into an
    integer code per table."""
    T, B, dim = planes.shape
    if B == 0:
        return np.zeros((len(V), T), dtype=np.int64)
    proj = V @ planes.reshape(T * B, dim).T  # (n, T*B)
    bits = (proj > 0).reshape(len(V), T, B)
    weights = (1 << np.arange(B, dtype=np.int64))
    return bits.astype(np.int64) @ weights  # (n, T)


def knn_lsh(ds, queries: np.ndarray, k: int = 5, *, n_tables: int = 8,
            n_bits: int = 10, n_probe: int = 4, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """LSH-bucketed approximate top-k: data-independent alternative to
    the IVF path — no training pass over the corpus, so it works on a
    cold stream.  Each vector hashes into one bucket per hyperplane
    table; a query probes its own bucket plus the ``n_probe - 1``
    multiprobe variants with the smallest flip margins (flipping the
    lowest-|projection| bit costs the least recall).  Only vectors in a
    probed bucket are scored; planes + probe map ship in the serialized
    task closure once per worker.

    ``n_probe >= 2**n_bits`` probes every bucket, making the result
    exactly brute force (the pytest oracle).  Candidates found by
    several tables dedup before the final top-k reduce.
    """
    from deltaray.functions.partition import take_first_per_key

    q = _unit(np.asarray(queries, dtype=np.float32))
    nq, dim = q.shape
    planes = lsh_planes(dim, n_tables, n_bits, seed)
    n_probe = min(n_probe, 1 << n_bits)

    # multiprobe: base code, then flip bits in ascending |projection|
    # order — enumerate single-bit flips plus greedy 2-bit combos until
    # n_probe codes per (query, table)
    probe_map: dict[tuple[int, int], list[int]] = {}
    for t in range(n_tables):
        proj = q @ planes[t].T  # (nq, n_bits)
        base = ((proj > 0).astype(np.int64)
                @ (1 << np.arange(n_bits, dtype=np.int64)))
        order = np.argsort(np.abs(proj), axis=1)
        for qi in range(nq):
            codes = [int(base[qi])]
            seen = {codes[0]}
            # single flips in margin order, then pairs of the cheapest
            for b in order[qi]:
                c = codes[0] ^ (1 << int(b))
                if c not in seen:
                    seen.add(c); codes.append(c)
                if len(codes) >= n_probe:
                    break
            if len(codes) < n_probe:
                for i in range(n_bits):
                    for j in range(i + 1, n_bits):
                        c = codes[0] ^ (1 << int(order[qi][i])) \
                            ^ (1 << int(order[qi][j]))
                        if c not in seen:
                            seen.add(c); codes.append(c)
                        if len(codes) >= n_probe:
                            break
                    if len(codes) >= n_probe:
                        break
            for c in codes[:n_probe]:
                probe_map.setdefault((t, c), []).append(qi)

    def score(batch: pa.Table) -> pa.Table:
        vecs = _unit(vecs_np(batch[vec_col], np.float32))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes = _lsh_codes(vecs, planes)  # (n, T)
        # a vector can reach the same query through several tables —
        # collect per-query candidate masks, dedup before scoring
        cand: dict[int, list[np.ndarray]] = {}
        for t in range(n_tables):
            ct = codes[:, t]
            for c in np.unique(ct):
                qs = probe_map.get((t, int(c)))
                if not qs:
                    continue
                idx = np.flatnonzero(ct == c)
                for qi in qs:
                    cand.setdefault(qi, []).append(idx)
        out_q, out_i, out_c = [], [], []
        for qi, idx_list in cand.items():
            idx = np.unique(np.concatenate(idx_list))
            sim = q[qi] @ vecs[idx].T
            kk = min(k, len(idx))
            top = np.argpartition(-sim, kk - 1)[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_i.append(ids[idx[top]])
            out_c.append(sim[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_i).astype(np.int64)),
            "cosine": pa.array(np.concatenate(out_c).astype(np.float64)),
        })

    cands = ds.map_batches(score, batch_format="pyarrow")
    from deltaray.util import to_table

    # empty-safe: zero candidate batches (e.g. no probed LSH bucket hit
    # any corpus vector) must yield the typed empty result, not a
    # concat_tables ValueError
    tbl = to_table(cands)
    # same (query, vec) may surface from several BLOCKS' bucket hits too
    tbl = take_first_per_key(tbl.sort_by([("query_id", "ascending"),
                                          (id_col, "ascending")]),
                             ["query_id", id_col])
    return _topk_reduce(tbl, k, id_col)


def assign_clusters(ds, centroids: np.ndarray, *, id_col: str = "vec_id",
                    vec_col: str = "embedding"):
    """Nearest-centroid assignment of every vector (the corpus-clustering
    read side of the distributed k-means trainer): one broadcast of the
    centroid matrix, one matmul per batch, output (id, cluster, cosine).
    Streams — no shuffle, no materialization."""
    C = _unit(np.asarray(centroids, dtype=np.float32))

    def assign(batch: pa.Table) -> pa.Table:
        V = _unit(vecs_np(batch[vec_col], np.float32))
        sim = V @ C.T
        a = sim.argmax(axis=1)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "cosine": pa.array(sim[np.arange(len(a)), a].astype(np.float64)),
        })

    return ds.map_batches(assign, batch_format="pyarrow")


def train_centroids_ds(ds, n_centroids: int, *, iters: int = 8,
                       vec_col: str = "embedding", seed: int = 42) -> np.ndarray:
    """Distributed k-means over the full embedding Dataset (Lloyd's
    algorithm on unit vectors): each iteration broadcasts the current
    centroids and reduces per-batch (sum, count) partials per centroid —
    shuffle-free, constant bytes per batch, the corpus streams every
    pass.  Replaces the driver-side-sample quantizer when the sample
    would not fit or represent the corpus."""
    import ray

    # init: hash-min sample — per block keep the n_centroids rows with
    # the smallest seed-salted row hash, reduce to the global smallest on
    # the driver.  Order-INDEPENDENT: "first batch" seeding varied run to
    # run because streaming execution does not preserve block arrival
    # order, and a different seed set sends Lloyd to a different optimum.
    # The hash is uniform over rows, so this is a uniform random sample
    # keyed only by (vector bytes, seed); duplicate vectors collapse to
    # one seed candidate (equal hashes) so k-means never starts with two
    # identical centroids.
    salt = np.uint64((seed * 0x9E3779B97F4A7C15 + 0xBF58476D1CE4E5B9)
                     & 0xFFFFFFFFFFFFFFFF)

    def seed_partial(batch: pa.Table) -> pa.Table:
        V = _unit(vecs_np(batch[vec_col], np.float32))
        with np.errstate(over="ignore"):
            W = V.view(np.uint32).astype(np.uint64)
            mult = np.empty(W.shape[1], dtype=np.uint64)
            mult[0] = np.uint64(1)
            for j in range(1, W.shape[1]):
                mult[j] = mult[j - 1] * np.uint64(31)
            h = (W * mult).sum(axis=1, dtype=np.uint64)
            h = (h ^ salt) * np.uint64(0xFF51AFD7ED558CCD)
        take = np.argsort(h, kind="stable")[:n_centroids]
        return pa.table({
            "h": pa.array(h[take]),
            "v": pa.array([V[i].tobytes() for i in take], pa.binary()),
        })

    cands = sorted(
        {(int(h), v)
         for b in ds.map_batches(seed_partial, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow")
         for h, v in zip(b["h"].to_pylist(), b["v"].to_pylist())})
    seen, rows = set(), []
    for h, v in cands:
        if h in seen:
            continue
        seen.add(h)
        rows.append(np.frombuffer(v, np.float32))
        if len(rows) >= n_centroids:
            break
    C = np.stack(rows)

    for _ in range(iters):
        cref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cc = ray.get(cref)
            V = _unit(vecs_np(batch[vec_col], np.float32))
            assign = (V @ Cc.T).argmax(axis=1)
            sums = np.zeros_like(Cc, dtype=np.float64)
            np.add.at(sums, assign, V)
            counts = np.bincount(assign, minlength=len(Cc))
            return pa.table({
                "sums": pa.array([sums.tobytes()], pa.binary()),
                "counts": pa.array([counts.astype(np.int64).tobytes()],
                                   pa.binary()),
            })

        # accumulate partials in SORTED byte order: block arrival order is
        # not deterministic under streaming execution, and float addition
        # order would otherwise leak ulp noise that Lloyd reassignment
        # amplifies run-to-run (same fix as the quality trainer's
        # digest-keyed gradient partials)
        parts = sorted(
            (sb, cb)
            for b in ds.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
            for sb, cb in zip(b["sums"].to_pylist(), b["counts"].to_pylist()))
        S = np.zeros_like(C, dtype=np.float64)
        N = np.zeros(len(C), dtype=np.int64)
        for sb, cb in parts:
            S += np.frombuffer(sb, np.float64).reshape(C.shape)
            N += np.frombuffer(cb, np.int64)
        live = N > 0
        C = C.copy()
        C[live] = (S[live] / N[live, None]).astype(np.float32)
        C = _unit(C)
    return C


def whiten_embeddings(ds, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", eps: float = 1e-5):
    """ZCA-whiten an embedding column: one streaming pass reduces the
    per-batch moment partials (Σx, Σxxᵀ, n — constant dim²·8 bytes per
    batch to the driver), the driver eigendecomposes the covariance
    once, and a second map-only pass projects (x−μ)·W with
    W = U·diag(1/√(λ+eps))·Uᵀ broadcast in the task closure.  The
    standard pre-step before cosine near-dup / ANN when raw embedding
    dimensions are correlated (whitened space makes hyperplane LSH
    bits independent).  Returns (id, embedding[whitened], w_norm).
    """
    import ray

    first = next(iter(ds.iter_batches(batch_size=8, batch_format="pyarrow")))
    dim = vecs_np(first[vec_col], np.float64).shape[1]

    def moments(batch: pa.Table) -> pa.Table:
        V = vecs_np(batch[vec_col], np.float64)
        return pa.table({
            "s": pa.array([V.sum(axis=0).tobytes()], pa.binary()),
            "ss": pa.array([(V.T @ V).tobytes()], pa.binary()),
            "n": pa.array([len(V)], pa.int64()),
        })

    # sorted-byte accumulation: block arrival order varies run-to-run
    # under streaming execution; fix the float summation order so the
    # whitening matrix is bit-deterministic (same pattern as the k-means
    # and quality-trainer partial reduces)
    parts = sorted(
        (s, ss, int(n))
        for b in ds.map_batches(moments, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        for s, ss, n in zip(b["s"].to_pylist(), b["ss"].to_pylist(),
                            b["n"].to_pylist()))
    S = np.zeros(dim, dtype=np.float64)
    SS = np.zeros((dim, dim), dtype=np.float64)
    N = 0
    for s, ss, n in parts:
        S += np.frombuffer(s, np.float64)
        SS += np.frombuffer(ss, np.float64).reshape(dim, dim)
        N += n
    if N == 0:
        raise ValueError("empty embedding dataset")
    mu = S / N
    cov = SS / N - np.outer(mu, mu)
    lam, U = np.linalg.eigh(cov)
    W = (U * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ U.T
    wref = ray.put((mu, W))

    def project(batch: pa.Table) -> pa.Table:
        mu_, W_ = ray.get(wref)
        V = vecs_np(batch[vec_col], np.float64)
        Z = (V - mu_) @ W_
        flat = pa.array(Z.ravel(), pa.float32())
        offs = pa.array(np.arange(0, (len(Z) + 1) * Z.shape[1], Z.shape[1],
                                  dtype=np.int32))
        return pa.table({
            id_col: batch[id_col],
            "embedding": pa.ListArray.from_arrays(offs, flat),
            "w_norm": pa.array(np.linalg.norm(Z, axis=1)),
        })

    return ds.map_batches(project, batch_format="pyarrow")
