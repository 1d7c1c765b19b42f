"""Side-effecting plan apply for the FILES source: execute a keeper
plan's DELETE decisions by moving the files into a quarantine
directory — the reference's apply step (ref: app/Commands.java:302-354
``applyPlan``/``safeMove``; SURVEY S9). The engine's primary contract
stays table-in/table-out (``quarantine_plan`` emits the decision
table); this module is the thin driver-side executor for the local
filesystem tier, where "apply" is inherently a sequential I/O walk,
not a distributed job.

Parity points with the reference:
- collision rename: a move whose target already exists gets a
  deterministic ``_<k>`` numeric suffix before the extension
  (``safeMove``, Commands.java:336-354) — same rule the
  ``quarantine_plan`` query encodes relationally;
- per-file error isolation: a missing or unmovable source is recorded
  in the manifest and skipped, never failing the apply run
  (Commands.java:76-84 skip posture);
- only DELETE rows act; KEEP rows are untouched.

Scale note: the DELETE set streams through ``toLocalIterator`` (one
partition in memory at a time). At cluster scale the move itself would
be a storage-API call per row inside ``foreachPartition``; the
manifest/rename/skip semantics here are the contract that path would
reuse.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def _local_path(p: str) -> str:
    """file:/ URI (binaryFile source form) or plain path -> local path."""
    if p.startswith("file:"):
        return unquote(urlparse(p).path)
    return p


def _collision_target(target: str, reserved: set[str]) -> str:
    """First free ``name``, ``name_1``, ``name_2``, ... (suffix before
    the extension, matching safeMove). ``reserved`` carries the targets
    already assigned THIS run, so dry-run manifests predict the same
    names a real apply produces, and a mid-run move error cannot make
    two rows claim one target."""
    def taken(p: str) -> bool:
        return p in reserved or os.path.exists(p)

    if not taken(target):
        return target
    stem, ext = os.path.splitext(target)
    k = 1
    while taken(f"{stem}_{k}{ext}"):
        k += 1
    return f"{stem}_{k}{ext}"


def apply_plan_moves(
    plan: DataFrame,
    quarantine_dir: str,
    dry_run: bool = False,
) -> list[dict]:
    """Execute the plan's DELETE rows as quarantine moves.

    Returns the manifest: one dict per DELETE row with
    ``{"src", "target", "status"}`` where status is ``moved``,
    ``would_move`` (dry_run), ``missing`` (source not found) or
    ``error: <msg>``. The manifest is the apply run's durable record —
    callers persist it next to the plan.
    """
    os.makedirs(quarantine_dir, exist_ok=True)
    manifest: list[dict] = []
    reserved: set[str] = set()
    rows = plan.filter(plan["action"] == "DELETE").select("path")
    for row in rows.toLocalIterator():
        src = _local_path(row["path"])
        target = _collision_target(
            os.path.join(quarantine_dir, os.path.basename(src)), reserved
        )
        reserved.add(target)
        if not os.path.exists(src):
            manifest.append({"src": src, "target": target,
                             "status": "missing"})
            continue
        if dry_run:
            manifest.append({"src": src, "target": target,
                             "status": "would_move"})
            continue
        try:
            shutil.move(src, target)
            manifest.append({"src": src, "target": target,
                             "status": "moved"})
        except OSError as exc:  # per-file isolation, reference posture
            manifest.append({"src": src, "target": target,
                             "status": f"error: {exc}"})
    return manifest
