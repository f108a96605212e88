"""deltaray — a Ray-Data-native CDC / incremental-ingest engine.

Re-expresses the capabilities of CDAP Delta (reference: /root/reference,
io.cdap.delta) as an idiomatic Ray Data pipeline over a Parquet lake of
pre-tokenized training sequences:

- change events (INSERT/UPDATE/DELETE DML + DDL) live in a partitioned
  Parquet event log, not a BlockingQueue (ref: delta-app/.../DeltaWorker.java:114);
- ordering is per-key (doc_id, seq), enforced by a hash-partition shuffle +
  last-writer-wins reduction instead of a single consumer thread
  (ref: delta-api/.../EventEmitter.java:20-23);
- exactly-once = idempotent write-once commit files keyed
  (partition, seq_range) instead of an (offset, seq) checkpoint service
  (ref: delta-api/.../EventConsumer.java:39-76);
- schema evolution = Arrow schema unification per partition at DDL barriers
  (ref: delta-api/.../DDLEvent.java:31-55).

No function in this package calls ray.init()/ray.shutdown(); callers own
the Ray session.
"""

from deltaray.commit import latest_generation, list_generations
from deltaray.config import (ReplayConfig, RetryConfig, TableConfig,
                             config_from_dict, config_to_dict, expand_macros)
from deltaray.drafts import DraftStore
from deltaray.pipeline import (
    DeltaFailureError,
    bootstrap_table,
    build_aggregate,
    lineage_report,
    committed_watermark,
    expire_snapshots,
    optimize_table,
    read_changes,
    refresh_aggregate,
    read_history,
    read_rows,
    read_table,
    read_table_ds,
    replay,
    replay_follow,
    reshard_generation,
    snapshots,
    earliest_snapshot,
    SnapshotExpiredError,
)
from deltaray.oracle import replay_oracle, tables_equal
from deltaray.sources import export_table, feed_to_events
from deltaray.transforms import register_directive

__all__ = [
    "DeltaFailureError",
    "bootstrap_table",
    "export_table",
    "feed_to_events",
    "DraftStore",
    "config_from_dict",
    "config_to_dict",
    "latest_generation",
    "list_generations",
    "ReplayConfig",
    "RetryConfig",
    "TableConfig",
    "expand_macros",
    "lineage_report",
    "committed_watermark",
    "expire_snapshots",
    "optimize_table",
    "build_aggregate",
    "read_changes",
    "read_history",
    "refresh_aggregate",
    "read_rows",
    "read_table",
    "read_table_ds",
    "register_directive",
    "replay",
    "replay_follow",
    "reshard_generation",
    "replay_oracle",
    "snapshots",
    "earliest_snapshot",
    "SnapshotExpiredError",
    "tables_equal",
]
