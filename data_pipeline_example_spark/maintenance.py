"""Operational maintenance utilities — workspace hygiene parity.

Rebuilds the reference's two operational conveniences (the last §2-adjacent
surface): local-URI scheme forcing (``services/batch/pipeline_batch.py:40-49``)
and the demo-data cleanup utility (``cleanup_demo_data.py:1-74``). Neither
touches query semantics; they exist so a user of the reference can run the
same "reset the workspace / force a local write" workflows here.

On a real cluster the default filesystem is typically HDFS/S3A, so a bare
``/path`` write lands on the distributed store; ``as_local_uri`` pins a path
to the node-local filesystem exactly as the reference does before its CSV
export. ``perform_cleanup`` clears artifact directories while *keeping* the
directories themselves (bind mounts / volume roots must survive a reset).
"""

from __future__ import annotations

import shutil
from collections.abc import Iterable
from pathlib import Path


def as_local_uri(path: str) -> str:
    """Force a path onto the local filesystem scheme
    (ref ``pipeline_batch.py:40-49``): idempotent, leaves explicit
    ``file://`` URIs untouched, prefixes everything else."""
    if path.startswith("file://"):
        return path
    return f"file://{path}"


# artifact directories the engine accumulates relative to a workspace
# root — the rebuild's analogue of the reference's CLEANUP_PATHS
# (ref cleanup_demo_data.py:22-29)
DEFAULT_CLEANUP_DIRS: dict[str, str] = {
    "Batch inputs": "data/input",
    "Batch & streaming outputs": "data/output",
    "Structured Streaming checkpoints": "checkpoints",
    "Local warehouse": "spark-warehouse",
}


def ensure_directory(path: Path) -> None:
    """Ensure ``path`` exists as a directory (a plain file in the way is
    replaced, ref ``cleanup_demo_data.py:33-38``)."""
    if path.exists() and not path.is_dir():
        path.unlink()
    path.mkdir(parents=True, exist_ok=True)


def clear_directory(path: Path) -> None:
    """Delete everything under ``path`` but keep the directory itself —
    volume roots and bind mounts must survive (ref
    ``cleanup_demo_data.py:41-54``)."""
    ensure_directory(path)
    for entry in path.iterdir():
        if entry.is_dir():
            shutil.rmtree(entry)
        else:
            entry.unlink()


def perform_cleanup(
    root: str | Path,
    dirs: dict[str, str] | None = None,
    *,
    dry_run: bool = False,
) -> list[tuple[str, Path, str]]:
    """Clear the engine's artifact directories under ``root``.

    Returns the actions taken as ``(label, path, action)`` tuples
    (action ∈ {"would-clear", "created", "cleared"}) instead of printing,
    so callers/tests can assert on them; the reference's dry-run
    semantics are preserved (ref ``cleanup_demo_data.py:57-74``).
    """
    root = Path(root)
    dirs = DEFAULT_CLEANUP_DIRS if dirs is None else dirs
    actions: list[tuple[str, Path, str]] = []
    for label, rel in sorted(dirs.items()):
        path = root / rel
        if dry_run:
            actions.append((label, path, "would-clear"))
            continue
        if not path.exists():
            ensure_directory(path)
            actions.append((label, path, "created"))
            continue
        clear_directory(path)
        actions.append((label, path, "cleared"))
    return actions
