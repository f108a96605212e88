"""Draft persistence + assessment surface.

Reference parity: the draft/assessment control plane
(delta-app/.../service/DraftService.java:42-101 saveDraft/getDraft/
listDrafts/deleteDraft, AssessmentHandler.java:77-311 assess-over-HTTP).
The Ray design has no HTTP tier — drafts are JSON files on the shared
filesystem (same contract as the commit log) and assessment calls the
in-process assessor, so any driver/CLI can CRUD and assess drafts with
plain file semantics.
"""

from __future__ import annotations

import json
import os

from deltaray.commit import atomic_write_json
from deltaray.config import ReplayConfig, config_from_dict, config_to_dict


class DraftStore:
    """CRUD over named pipeline-config drafts (DraftService analog).

    A draft is the JSON form of a ReplayConfig; macros (``${key}``) may
    remain unevaluated in a stored draft and resolve at ``to_config``
    time, matching the reference's evaluate-at-instantiation rule.
    """

    def __init__(self, root: str):
        self.root = root

    def _path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad draft name {name!r}")
        return os.path.join(self.root, f"{name}.json")

    def save(self, name: str, cfg: ReplayConfig | dict) -> dict:
        """Create or overwrite a draft (saveDraft, DraftService.java:42-66).
        Accepts a ReplayConfig or an already-serialized dict (the latter
        may contain unresolved macros)."""
        d = cfg if isinstance(cfg, dict) else config_to_dict(cfg)
        atomic_write_json(self._path(name), d)
        return d

    def get(self, name: str) -> dict:
        path = self._path(name)
        if not os.path.exists(path):
            raise KeyError(f"no draft {name!r}")
        with open(path) as f:
            return json.load(f)

    def list(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(f[:-5] for f in os.listdir(self.root)
                      if f.endswith(".json"))

    def delete(self, name: str) -> bool:
        path = self._path(name)
        if os.path.exists(path):
            os.remove(path)
            return True
        return False

    def to_config(self, name: str,
                  runtime_args: dict[str, str] | None = None) -> ReplayConfig:
        """Instantiate the draft as a runnable config; ``${key}`` macros
        resolve from ``runtime_args`` (DeltaWorker.java:208-213)."""
        return config_from_dict(self.get(name), runtime_args)

    def assess(self, name: str,
               runtime_args: dict[str, str] | None = None) -> dict:
        """Dry-run assessment of a draft (AssessmentHandler assessDraft
        analog): no lake writes, returns the per-table/column report."""
        from deltaray.assess import assess_pipeline

        return assess_pipeline(self.to_config(name, runtime_args))
