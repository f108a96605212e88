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
    tbl = pa.concat_tables(list(cands.iter_batches(batch_format="pyarrow")))
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
    tbl = pa.concat_tables(list(cands.iter_batches(batch_format="pyarrow")))
    return _topk_reduce(tbl, k, id_col)


def train_centroids_ds(ds, n_centroids: int, *, iters: int = 8,
                       vec_col: str = "embedding", seed: int = 42) -> np.ndarray:
    """Distributed k-means over the full embedding Dataset (Lloyd's
    algorithm on unit vectors): each iteration broadcasts the current
    centroids and reduces per-batch (sum, count) partials per centroid —
    shuffle-free, constant bytes per batch, the corpus streams every
    pass.  Replaces the driver-side-sample quantizer when the sample
    would not fit or represent the corpus."""
    import ray

    # init: first batch's vectors (deterministic) seed the centroids
    first = next(iter(ds.iter_batches(batch_size=max(1024, 4 * n_centroids),
                                      batch_format="pyarrow")))
    X0 = _unit(vecs_np(first[vec_col], np.float32))
    rng = np.random.default_rng(seed)
    C = X0[rng.choice(len(X0), size=min(n_centroids, len(X0)),
                      replace=False)]

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

        S = np.zeros_like(C, dtype=np.float64)
        N = np.zeros(len(C), dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            for sb, cb in zip(b["sums"].to_pylist(), b["counts"].to_pylist()):
                S += np.frombuffer(sb, np.float64).reshape(C.shape)
                N += np.frombuffer(cb, np.int64)
        live = N > 0
        C = C.copy()
        C[live] = (S[live] / N[live, None]).astype(np.float32)
        C = _unit(C)
    return C
