"""Distributed exact order statistics without a global sort.

``exact_percentiles`` computes exact discrete quantiles (the value at
0-based rank ``floor((n-1)*q)``, matching DuckDB/ANSI ``quantile_disc``)
over a Dataset column in a constant number of streaming passes:

1. one aggregate pass for (min, max, non-null count);
2. up to ``max_iters`` histogram passes, each narrowing every quantile's
   candidate range to one bucket of a ``num_bins`` histogram — per-pass
   reduce volume is O(num_bins · #quantiles), independent of data size;
3. one final pass pulling only the rows inside the (tiny) final ranges,
   finished locally with ``np.partition``.

A global ``ds.sort`` would shuffle every row; this moves only histogram
counts plus a bounded candidate set, so it holds at 10^10 rows.  Ranges
are half-open ``[rlo, rhi)`` except the current global top, which is
closed — exactly mirroring the bin-assignment rule, so counts and pulls
always agree.  A range that collapses to zero width (massive duplicates)
resolves immediately to that value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def grouped_percentiles(ds, *, key: str, col: str, q: float,
                        num_partitions: int = 64):
    """Exact per-key ``quantile_disc`` (value at 0-based rank
    ``floor((n_key - 1) * q)`` within each key's values, nulls ignored).

    One hash exchange; inside a partition block the whole computation is
    a single sort + factorize + gather — no per-key Python.  Assumes one
    key's values fit in a worker (same contract as every grouped
    operator here); for a single giant key use :func:`exact_percentiles`
    on that key's filtered Dataset instead.
    """
    from deltaray.functions.partition import group_codes, hash_partitioned

    def block_fn(block: pa.Table) -> pa.Table:
        g = block.drop_null().sort_by([(key, "ascending"),
                                       (col, "ascending")])
        codes = group_codes(g, [key])
        _, first, counts = np.unique(codes, return_index=True,
                                     return_counts=True)
        pick = first + np.floor((counts - 1) * q).astype(np.int64)
        return pa.table({key: g[key].take(pa.array(first)),
                         "value": g[col].take(pa.array(pick))})

    return hash_partitioned(ds, [key], block_fn,
                            num_partitions=num_partitions)


def exact_percentiles(ds, col: str, qs: list[float], *, num_bins: int = 8192,
                      max_iters: int = 6, max_pull: int = 4_000_000) -> pa.Table:
    """Exact ``quantile_disc`` values for each q in ``qs`` over ``ds[col]``.

    Returns (q: float64, value: float64), one row per quantile in the
    given order.  Nulls are ignored (SQL aggregate semantics).
    """
    def _col(batch: pa.Table) -> np.ndarray:
        v = batch[col].drop_null()
        return v.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)

    # ---- pass 1: min / max / count ------------------------------------
    def minmax(batch: pa.Table) -> pa.Table:
        arr = _col(batch)
        if len(arr) == 0:
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"mn": [float(arr.min())], "mx": [float(arr.max())],
                         "n": [len(arr)]})

    lo, hi, n = np.inf, -np.inf, 0
    for t in ds.map_batches(minmax, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        if t.num_rows:
            lo = min(lo, min(t["mn"].to_pylist()))
            hi = max(hi, max(t["mx"].to_pylist()))
            n += sum(t["n"].to_pylist())
    if n == 0:
        return pa.table({"q": pa.array(qs, pa.float64()),
                         "value": pa.nulls(len(qs), pa.float64())})

    # state per quantile: candidate range, rank within it, rows in it
    state = [{"rlo": lo, "rhi": hi, "top": True,
              "k": int(np.floor((n - 1) * q)), "count": n, "value": None}
             for q in qs]
    for s in state:
        if s["rlo"] == s["rhi"]:
            s["value"] = s["rlo"]

    def mask(arr: np.ndarray, s: dict) -> np.ndarray:
        if s["top"]:
            return (arr >= s["rlo"]) & (arr <= s["rhi"])
        return (arr >= s["rlo"]) & (arr < s["rhi"])

    # ---- histogram refinement passes ----------------------------------
    for _ in range(max_iters):
        active = [j for j, s in enumerate(state)
                  if s["value"] is None and s["count"] > max_pull]
        if not active:
            break
        edges = {j: np.linspace(state[j]["rlo"], state[j]["rhi"],
                                num_bins + 1) for j in active}
        snap = {j: dict(state[j]) for j in active}

        def hist(batch: pa.Table) -> pa.Table:
            arr = _col(batch)
            js, bins, cnts = [], [], []
            for j in active:
                a = arr[mask(arr, snap[j])]
                if len(a) == 0:
                    continue
                idx = np.clip(np.searchsorted(edges[j], a, side="right") - 1,
                              0, num_bins - 1)
                b, c = np.unique(idx, return_counts=True)
                js.append(np.full(len(b), j, dtype=np.int32))
                bins.append(b.astype(np.int32))
                cnts.append(c.astype(np.int64))
            if not js:
                return pa.table({"j": pa.array([], pa.int32()),
                                 "bin": pa.array([], pa.int32()),
                                 "cnt": pa.array([], pa.int64())})
            return pa.table({"j": pa.array(np.concatenate(js)),
                             "bin": pa.array(np.concatenate(bins)),
                             "cnt": pa.array(np.concatenate(cnts))})

        totals = {j: np.zeros(num_bins, dtype=np.int64) for j in active}
        for t in ds.map_batches(hist, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            if t.num_rows == 0:
                continue
            tj = t["j"].to_numpy(zero_copy_only=False)
            tb = t["bin"].to_numpy(zero_copy_only=False)
            tc = t["cnt"].to_numpy(zero_copy_only=False)
            for j in np.unique(tj):
                sel = tj == j
                np.add.at(totals[int(j)], tb[sel], tc[sel])

        for j in active:
            s, e = state[j], edges[j]
            cum = np.cumsum(totals[j])
            b = int(np.searchsorted(cum, s["k"], side="right"))
            s["k"] -= int(cum[b - 1]) if b > 0 else 0
            s["count"] = int(totals[j][b])
            s["top"] = s["top"] and b == num_bins - 1
            s["rlo"], s["rhi"] = float(e[b]), float(e[b + 1])
            if s["rlo"] == s["rhi"] or s["count"] == 0:
                s["value"] = s["rlo"]

    # ---- final pass: pull candidate rows, select k-th smallest --------
    pending = [j for j, s in enumerate(state) if s["value"] is None]
    if pending:
        snap = {j: dict(state[j]) for j in pending}

        def pull(batch: pa.Table) -> pa.Table:
            arr = _col(batch)
            js, vals = [], []
            for j in pending:
                a = arr[mask(arr, snap[j])]
                if len(a):
                    js.append(np.full(len(a), j, dtype=np.int32))
                    vals.append(a)
            if not js:
                return pa.table({"j": pa.array([], pa.int32()),
                                 "v": pa.array([], pa.float64())})
            return pa.table({"j": pa.array(np.concatenate(js)),
                             "v": pa.array(np.concatenate(vals))})

        acc: dict[int, list[np.ndarray]] = {j: [] for j in pending}
        for t in ds.map_batches(pull, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow"):
            if t.num_rows == 0:
                continue
            tj = t["j"].to_numpy(zero_copy_only=False)
            tv = t["v"].to_numpy(zero_copy_only=False)
            for j in np.unique(tj):
                acc[int(j)].append(tv[tj == j])
        for j in pending:
            vals = np.concatenate(acc[j]) if acc[j] else np.array([])
            s = state[j]
            s["value"] = float(np.partition(vals, s["k"])[s["k"]])

    return pa.table({"q": pa.array(qs, pa.float64()),
                     "value": pa.array([s["value"] for s in state],
                                       pa.float64())})


class _HLL:
    """Dense HyperLogLog register set (public algorithm: Flajolet et al.
    2007, with the standard small-range linear-counting correction)."""

    def __init__(self, p: int):
        self.p = p
        self.m = 1 << p
        self.regs = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1, via bit_length
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] <<= np.uint64(shift)
        rank = lz.astype(np.uint8) + 1
        np.maximum.at(self.regs, idx, rank)

    def merge(self, other: "_HLL") -> None:
        np.maximum(self.regs, other.regs, out=self.regs)

    def estimate(self) -> float:
        m = float(self.m)
        am = 0.7213 / (1 + 1.079 / m)
        e = am * m * m / float(np.sum(2.0 ** -self.regs.astype(np.float64)))
        zeros = int(np.sum(self.regs == 0))
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting, small range
        return e


def approx_distinct(ds, col: str, *, precision: int = 14) -> pa.Table:
    """Approximate distinct count via HyperLogLog — the sketch path for
    cardinalities where exact two-phase distinct (``#distinct`` rows
    through a shuffle) is too wide.

    Each batch folds its values into a 2^precision-register sketch
    (combiner); only the fixed-size register arrays travel to the driver,
    which merges by elementwise max — NO shuffle at all, constant bytes
    per batch regardless of cardinality.  Standard error ≈
    1.04/sqrt(2^precision) (~0.8% at the default p=14, 16 KiB).
    Returns (n_distinct_approx, precision).
    """
    from deltaray.transforms import stable_hash_cols

    from deltaray.transforms import mix64

    def sketch(batch: pa.Table) -> pa.Table:
        h = _HLL(precision)
        if batch.num_rows:
            h.add_hashes(mix64(stable_hash_cols(batch, [col])))
        return pa.table({"regs": pa.array([h.regs.tobytes()], pa.binary())})

    out = _HLL(precision)
    for b in ds.map_batches(sketch, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for buf in b["regs"].to_pylist():
            o = _HLL(precision)
            o.regs = np.frombuffer(buf, dtype=np.uint8).copy()
            out.merge(o)
    return pa.table({
        "n_distinct_approx": pa.array([int(round(out.estimate()))],
                                      pa.int64()),
        "precision": pa.array([precision], pa.int64()),
    })


def heavy_hitters(ds, col: str, *, k: int = 20, width: int = 4096,
                  depth: int = 4, candidates_per_batch: int | None = None,
                  seed: int = 42) -> pa.Table:
    """Approximate top-k heavy hitters via a count-min sketch (Cormode &
    Muthukrishnan 2005) with EXACT verified counts for the returned set.

    Per batch (combiner): exact local counts fold into a depth×width
    count-min sketch, and the batch's own top candidates travel alongside
    — so only (sketch + ~2k candidate rows) per batch reach the driver,
    never the full value distribution (the scale win over exact top-k
    when cardinality explodes).  The driver sums the sketches, shortlists
    the candidate union by count-min estimate (never an underestimate),
    and a second exact pass counts ONLY the shortlist, making the
    returned counts exact.  A true heavy hitter missed by every batch's
    local top list could be absent — vanishingly unlikely under the
    skewed distributions heavy-hitter queries target; for FLAT
    distributions size ``candidates_per_batch`` near the per-batch
    distinct count (or use the exact top-k operators).
    Returns (value, n) sorted by (n desc, value asc), k rows.
    """
    from deltaray.transforms import stable_hash_cols

    # all candidate arrays are built with the INPUT column's Arrow type —
    # inference from Python lists would re-type numeric/temporal columns
    # (and the empty result used to hardcode string)
    vtype = dict(zip(ds.schema().names, ds.schema().types))[col]
    cpb = candidates_per_batch or max(2 * k, 64)
    row_seeds = np.arange(1, depth + 1, dtype=np.uint64) * np.uint64(seed * 2 + 1)

    from deltaray.transforms import mix64

    def sketch_batch(batch: pa.Table) -> pa.Table:
        t = pa.table({col: batch[col]}).group_by(col).aggregate(
            [([], "count_all")]).rename_columns([col, "n"])
        h = stable_hash_cols(t, [col])
        counts = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        cm = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            idx = (mix64(h ^ row_seeds[d]) % np.uint64(width)).astype(np.int64)
            np.add.at(cm[d], idx, counts)
        top = t.sort_by([("n", "descending"), (col, "ascending")]) \
            .slice(0, cpb)
        return pa.table({
            "cm": pa.array([cm.tobytes()], pa.binary()),
            "cand": pa.array([top[col].to_pylist()], pa.list_(vtype)),
            "cand_n": pa.array([top["n"].to_pylist()], pa.list_(pa.int64())),
        })

    cm_total = np.zeros((depth, width), dtype=np.int64)
    cands: set = set()
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        for buf, cv in zip(b["cm"].to_pylist(), b["cand"].to_pylist()):
            cm_total += np.frombuffer(buf, dtype=np.int64).reshape(depth, width)
            cands.update(cv)
    if not cands:
        return pa.table({"value": pa.array([], vtype),
                         "n": pa.array([], pa.int64())})
    cand_list = sorted(cands)
    cap = max(4 * k, 4096)
    if len(cand_list) <= cap:
        # small union: exact-count every candidate — immune to count-min
        # overestimation noise on FLAT distributions (where estimates
        # barely separate values); the CM shortlist only kicks in when
        # the union is too wide to count exactly
        shortlist = cand_list
    else:
        ct = pa.table({col: pa.array(cand_list, vtype)})
        h = stable_hash_cols(ct, [col])
        est = np.full(len(cand_list), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(depth):
            idx = (mix64(h ^ row_seeds[d]) % np.uint64(width)).astype(np.int64)
            est = np.minimum(est, cm_total[d, idx])
        order = np.lexsort((np.array(cand_list, dtype=object), -est))
        shortlist = [cand_list[i] for i in order[:cap]]

    # exact pass over the shortlist only
    import ray
    sref = ray.put(pa.array(shortlist, vtype))

    def exact_counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = batch.filter(pc.is_in(batch[col], value_set=ray.get(sref)))
        if sel.num_rows == 0:
            return pa.table({col: pa.array([], batch[col].type),
                             "n": pa.array([], pa.int64())})
        t = pa.table({col: sel[col]}).group_by(col).aggregate(
            [([], "count_all")])
        return t.rename_columns([col, "n"])

    from ray.data.aggregate import Sum

    agg = ds.map_batches(exact_counts, batch_format="pyarrow") \
        .groupby(col).aggregate(Sum("n", alias_name="n_exact"))
    tbl = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow")))
    tbl = tbl.rename_columns(["value", "n"]).sort_by(
        [("n", "descending"), ("value", "ascending")])
    return tbl.slice(0, k)
