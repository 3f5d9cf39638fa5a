"""Per-stage manifests: checkpoint-resume with lineage + metrics.

Ivory's resume story is "skip the job if its output dir exists"
(ivory/core/preprocess/BuildTermDocVectors.java:346-350). We make that
auditable: every stage writes <index_root>/_manifests/<stage>.json with
an input fingerprint, config fingerprint, row counts, partition lineage
and wall time; a stage is skipped only when its manifest validates
against the current inputs AND its artifact directory has a Spark
_SUCCESS marker. A killed build re-runs only the stages whose manifests
are missing/invalid (tested in tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any


def _manifest_path(index_root: str, stage: str) -> str:
    return os.path.join(index_root, "_manifests", f"{stage}.json")


def artifact_complete(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "_SUCCESS"))


def load_manifest(index_root: str, stage: str) -> dict[str, Any] | None:
    p = _manifest_path(index_root, stage)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def stage_is_valid(
    index_root: str, stage: str, input_fingerprint: dict[str, Any], artifacts: list[str]
) -> bool:
    m = load_manifest(index_root, stage)
    if m is None or m.get("status") != "complete":
        return False
    if m.get("input_fingerprint") != input_fingerprint:
        return False
    return all(
        artifact_complete(a) if os.path.isdir(a) else os.path.exists(a) for a in artifacts
    )


@dataclass
class StageRun:
    """Context manager that times a stage and writes its manifest."""

    index_root: str
    stage: str
    input_fingerprint: dict[str, Any]
    metrics: dict[str, Any] = field(default_factory=dict)

    def __enter__(self) -> "StageRun":
        self._t0 = time.monotonic()
        return self

    def record_artifact(self, path: str) -> None:
        """Per-partition output lineage: one entry per parquet part file
        (name, bytes) plus totals — auditable evidence of what this stage
        wrote (the north rule's per-partition lineage; at cluster scale
        each part file is one task's output)."""
        parts = []
        if os.path.isdir(path):
            for name in sorted(os.listdir(path)):
                if name.startswith(("_", ".")):
                    continue
                parts.append(
                    {"file": name, "bytes": os.path.getsize(os.path.join(path, name))}
                )
        self.metrics.setdefault("artifacts", {})[os.path.basename(path)] = {
            "n_part_files": len(parts),
            "bytes_total": sum(p["bytes"] for p in parts),
            "parts": parts,
        }

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            return  # no manifest on failure → stage re-runs on resume
        out = {
            "stage": self.stage,
            "status": "complete",
            "input_fingerprint": self.input_fingerprint,
            "metrics": self.metrics,
            "wall_time_sec": round(time.monotonic() - self._t0, 3),
        }
        p = _manifest_path(self.index_root, self.stage)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        os.replace(tmp, p)
