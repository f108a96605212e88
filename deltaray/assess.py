"""Assessment (dry-run) service — config-time validation of a replay
pipeline against an event log, without touching the lake.

Mirrors the reference's Assessor (delta-app/.../service/Assessor.java):
``list_tables`` (:93-97), ``describe_table`` (:117-126), ``assess_table``
(:141-182 — filter columns by whitelist, warn on unselected primary key
:290-312, apply transformations to the schema), ``assess_pipeline``
(:201-268) and the support-level summary (``summarize`` :455-477).

The "table registry" here is the event log's DDL stream: the final schema
of each table is what a full replay would leave behind, computed
driver-side from the (tiny) set of DDL rows — no Ray needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from deltaray.config import ReplayConfig
from deltaray.schemas import _TYPE_CODES, TableSchema, apply_ddl
from deltaray.transforms import DIRECTIVES, apply_directives_to_schema, parse_directive

# Support levels (delta-api/.../api/assessment/ColumnSupport.java)
YES, PARTIAL, NO = "YES", "PARTIAL", "NO"

# Types the merge/LWW engine round-trips exactly; everything else in the
# codec still replays but float comparisons in oracles are approximate.
_EXACT = {"int32", "int64", "string", "bool", "timestamp[us]",
          "list<int32>", "list<int64>"}


@dataclass
class ColumnAssessment:
    name: str
    type_code: str
    support: str
    suggestion: str | None = None


@dataclass
class TableAssessment:
    table: str
    key: str
    columns: list[ColumnAssessment] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)


def _final_schemas(event_log: str) -> dict[str, TableSchema]:
    """Replay only the DDL rows driver-side → final per-table schemas
    (TableRegistry.standardize analog — the log is already standardized)."""
    from deltaray.pipeline import discover_segments, load_ddl_events

    schemas: dict[str, TableSchema] = {}
    for row in load_ddl_events(discover_segments(event_log)):
        schemas = apply_ddl(schemas, row["table"], row["op"],
                            row["ddl_payload"], row["seq"])
    return schemas


def list_tables(event_log: str) -> list[str]:
    """Assessor.listTables:93-97 analog."""
    return sorted(_final_schemas(event_log))


def describe_table(event_log: str, table: str) -> TableSchema:
    """Assessor.describeTable:117-126 analog: final schema after all DDL."""
    schemas = _final_schemas(event_log)
    if table not in schemas:
        raise KeyError(f"unknown table {table!r}")
    return schemas[table]


def _assess_columns(schema: TableSchema) -> list[ColumnAssessment]:
    out = []
    for name, code in schema.fields:
        if code not in _TYPE_CODES:
            out.append(ColumnAssessment(name, code, NO,
                                        f"type {code!r} is not replicable"))
        elif code in _EXACT:
            out.append(ColumnAssessment(name, code, YES))
        else:
            out.append(ColumnAssessment(
                name, code, PARTIAL,
                "floating-point column: replay is exact but external "
                "comparisons should use a tolerance"))
    return out


def assess_table(cfg: ReplayConfig, table: str,
                 schemas: dict[str, TableSchema] | None = None) -> TableAssessment:
    """Assessor.assessTable:141-182 analog: whitelist filter → directive
    chain over the schema → column verdicts + structural warnings."""
    schemas = schemas if schemas is not None else _final_schemas(cfg.event_log)
    if table not in schemas:
        return TableAssessment(table, key="", errors=[f"table {table!r} not in event log"])
    schema = schemas[table]
    ta = TableAssessment(table, key=schema.key)
    tc = cfg.table_config(table)

    # column whitelist (SourceTable.java:69-72); unselected PK warns
    # (Assessor.java:290-312)
    if tc and tc.columns is not None:
        missing = set(tc.columns) - set(schema.column_names())
        for m in sorted(missing):
            ta.errors.append(f"whitelisted column {m!r} does not exist")
        missing_pk = [k for k in schema.keys if k not in tc.columns]
        if missing_pk:
            ta.warnings.append(
                f"primary key {missing_pk!r} is not in the column whitelist; "
                "upserts cannot be keyed — it will be selected anyway")
        keep = set(tc.columns) | set(schema.keys)
        schema = TableSchema(schema.name, schema.key,
                             [(n, c) for n, c in schema.fields if n in keep],
                             dict(schema.renames), schema.version_seq)

    # unknown directives / directive failures surface as errors, not crashes
    directives = tc.transformations if tc else []
    for d in directives:
        name, _ = parse_directive(d)
        if name not in DIRECTIVES:
            ta.errors.append(f"unknown directive {name!r} in {d!r}")
    try:
        schema = apply_directives_to_schema(schema, directives)
    except Exception as e:  # rename collision, bad args, ...
        ta.errors.append(f"directive chain failed on schema: {e}")

    # blacklist sanity (mirrors DeltaConfig.java:111-115 validation intent)
    if "INSERT" in cfg.dml_blacklist_for(table):
        ta.warnings.append("INSERT is blacklisted: table can only shrink")

    ta.columns = _assess_columns(schema)
    return ta


def summarize(assessments: list[TableAssessment]) -> dict:
    """Assessor.summarize:455-477 analog: per-table counts by support."""
    tables = {}
    for ta in assessments:
        counts = {YES: 0, PARTIAL: 0, NO: 0}
        for c in ta.columns:
            counts[c.support] += 1
        tables[ta.table] = {
            "columns": counts,
            "warnings": len(ta.warnings),
            "errors": len(ta.errors),
        }
    return {
        "tables": tables,
        "ok": all(not ta.errors for ta in assessments),
    }


def assess_pipeline(cfg: ReplayConfig) -> dict:
    """Assessor.assessPipeline:201-268 analog: assess every configured
    table (or every table in the log when none configured)."""
    schemas = _final_schemas(cfg.event_log)
    names = sorted(cfg.table_names or schemas)
    assessments = [assess_table(cfg, t, schemas) for t in names]
    report = summarize(assessments)
    report["assessments"] = [
        {
            "table": ta.table,
            "key": ta.key,
            "columns": [
                {"name": c.name, "type": c.type_code, "support": c.support,
                 **({"suggestion": c.suggestion} if c.suggestion else {})}
                for c in ta.columns
            ],
            "warnings": ta.warnings,
            "errors": ta.errors,
        }
        for ta in assessments
    ]
    return report
