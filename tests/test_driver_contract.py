"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() on the same parquet tables, compare rowcount +
order-insensitive values."""

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

from tests.conftest import SF_DIR

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t)}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _compare(name: str, got: pd.DataFrame, want: pd.DataFrame):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    got = got[sorted(got.columns)].sort_values(sorted(got.columns)) \
        .reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(sorted(want.columns)) \
        .reset_index(drop=True)
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype != b.dtype:
            try:
                b = b.astype(a.dtype)
            except (TypeError, ValueError):
                pass
        pd.testing.assert_series_equal(a, b, check_names=False,
                                       check_dtype=False, obj=f"{name}.{c}")


SQL = entrymod.oracle_sql()
ALL = entrymod.queries()


@pytest.mark.parametrize("name", sorted(SQL))
def test_query_vs_oracle(name):
    got = _to_pandas(ALL[name](SF_DIR))
    want = _duck(SF_DIR, SQL[name])
    _compare(name, got, want)


@pytest.mark.parametrize("name", sorted(set(ALL) - set(SQL)))
def test_rows_only_queries_run(name):
    got = _to_pandas(ALL[name](SF_DIR))
    assert got is not None
    # deterministic across two runs
    got2 = _to_pandas(ALL[name](SF_DIR))

    def norm(df):
        df = df.copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                    hasattr(v, "__len__") and not isinstance(v, (str, bytes))
                    else v
                )
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(got), norm(got2), check_dtype=False)


def test_entry_smoke():
    res = entrymod.entry()  # driver contract: a ray.data.Dataset
    assert res.count() > 0
    assert "doc_id" in res.schema().names
