"""Assessment (dry-run) service tests — Assessor analog
(delta-app/.../service/Assessor.java; AssessmentHandler routes)."""

import pytest

from deltaray import ReplayConfig, TableConfig
from deltaray.assess import (
    assess_pipeline,
    assess_table,
    describe_table,
    list_tables,
)
from deltaray.gen import write_event_log


@pytest.fixture
def log(tmp_path):
    p = str(tmp_path / "events")
    write_event_log(
        p, n_docs=50, n_events=400, seed=11,
        ddl=[(100, "docs", "ALTER_TABLE", {"add": ("lang", "string"),
                                           "choices": ["en", "de"]}),
             (200, "docs", "RENAME_COLUMN", {"rename": ("source", "origin")})],
    )
    return p


def test_list_and_describe(log):
    assert list_tables(log) == ["docs"]
    s = describe_table(log, "docs")
    assert s.key == "doc_id"
    assert "lang" in s.column_names()          # ALTER applied
    assert "origin" in s.column_names()        # RENAME applied
    assert "source" not in s.column_names()
    with pytest.raises(KeyError):
        describe_table(log, "nope")


def test_assess_supported_columns(log, tmp_path):
    cfg = ReplayConfig(event_log=log, lake=str(tmp_path / "lake"))
    ta = assess_table(cfg, "docs")
    assert not ta.errors
    by_name = {c.name: c for c in ta.columns}
    assert by_name["doc_id"].support == "YES"
    assert by_name["tokens"].support == "YES"


def test_assess_whitelist_pk_warning(log, tmp_path):
    # PK missing from whitelist warns but is force-selected
    # (Assessor.java:290-312)
    cfg = ReplayConfig(
        event_log=log, lake=str(tmp_path / "lake"),
        tables=[TableConfig("docs", columns=["tokens", "n_tok"])],
    )
    ta = assess_table(cfg, "docs")
    assert any("primary key" in w for w in ta.warnings)
    assert "doc_id" in [c.name for c in ta.columns]


def test_assess_errors(log, tmp_path):
    cfg = ReplayConfig(
        event_log=log, lake=str(tmp_path / "lake"),
        tables=[TableConfig("docs", columns=["doc_id", "no_such_col"],
                            transformations=["frobnicate x"])],
    )
    ta = assess_table(cfg, "docs")
    assert any("no_such_col" in e for e in ta.errors)
    assert any("frobnicate" in e for e in ta.errors)
    missing = assess_table(cfg, "ghost")
    assert missing.errors


def test_assess_pipeline_report(log, tmp_path):
    cfg = ReplayConfig(event_log=log, lake=str(tmp_path / "lake"))
    rep = assess_pipeline(cfg)
    assert rep["ok"]
    assert rep["tables"]["docs"]["columns"]["YES"] >= 4
    assert rep["assessments"][0]["table"] == "docs"
