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
import threading

# Bump when the staged-file FORMAT changes (not just fixture contents):
# old staged dirs then fingerprint-mismatch and restage. v2: events.ts
# staged as TIMESTAMP (r2 vanilla sessions staged TIMESTAMP_NTZ files,
# which watermarks reject).
STAGING_VERSION = "4"  # r11: staged BPE merge table grew 3 -> 8 rows

# Staging is one-time work shared across the bench's parallel query
# threads; serialize the check-then-write so concurrent callers can't
# drop a table under a reader or double-CTAS (process-local is enough —
# cross-process reuse goes through the fingerprint file).
staging_lock = threading.Lock()

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


def fixture_fingerprint(sf_dir: str) -> str:
    """Identity of the fixture dir's current contents (name/size/mtime of
    every parquet file). Staged derivations (bucketed tables, streaming
    replay files) record this so a driver-side regeneration of the
    fixtures — which can change both values AND physical types — is
    detected and the stale staging rebuilt instead of silently reused."""
    parts = [f"v{STAGING_VERSION}"]
    for fn in sorted(os.listdir(sf_dir)):
        if fn.endswith(".parquet"):
            st = os.stat(os.path.join(sf_dir, fn))
            parts.append(f"{fn}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


_FP_FILE = ".fixture_fp"


def staging_current(path: str, sf_dir: str) -> bool:
    """True iff ``path`` was staged from the fixture dir's CURRENT files."""
    try:
        with open(os.path.join(path, _FP_FILE)) as fh:
            return fh.read() == fixture_fingerprint(sf_dir)
    except OSError:
        return False


def mark_staged(path: str, sf_dir: str, fp: str | None = None) -> None:
    """Stamp ``path`` as staged from ``sf_dir``.

    Pass ``fp`` captured via ``fixture_fingerprint`` BEFORE reading the
    source tables: if fixtures are regenerated mid-staging, the stale
    staged data then carries the OLD stamp, mismatches, and is rebuilt —
    stamping after the write would bless it forever.
    """
    with open(os.path.join(path, _FP_FILE), "w") as fh:
        fh.write(fp if fp is not None else fixture_fingerprint(sf_dir))
