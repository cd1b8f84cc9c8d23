"""Scratch workspace for operators that need to WRITE (sinks, Delta-like
tables, CSV/JSON staging, streaming sources/checkpoints).

Everything lands under ``<repo>/.work/<sf_name>/<name>`` so the repo stays
self-contained (fixture dirs are read-only). Each operator overwrites its
own subdirectory on every run — queries stay order-independent and
re-runnable.
"""

from __future__ import annotations

import os
import shutil

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WORK_ROOT = os.path.join(_REPO, ".work")


def workdir(sf_dir: str, name: str, fresh: bool = True) -> str:
    """Absolute scratch path for (fixture dir, operator); wiped if fresh."""
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "default"
    path = os.path.join(WORK_ROOT, sf_name, name)
    if fresh and os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    return path
