"""Provenance stamping for committed hardware evidence.

The on-chip validation battery (tools/run_hwtests.py) pins its results as
JSONs under tests/data/. Those records are only evidence for the source
revision that produced them: a kernel edit without a hardware re-run would
otherwise still read as validated. Every evidence JSON therefore carries a
`provenance` stamp — the git revision and a content hash of the compute
path (`msk144cudecoder_tpu/ops/*.py`) — and the CPU suite
(tests/test_hw.py) fails when the pinned hash no longer matches the working
tree, turning "evidence predates the kernels" into a red suite instead of a
silent pass. (The reference ships no hardware evidence at all; this binds
ours to the code it validates.)
"""

from __future__ import annotations

import hashlib
import pathlib
import subprocess

_PKG = pathlib.Path(__file__).resolve().parents[1]
_REPO = _PKG.parent

#: compute-path sources whose edits invalidate pinned hardware evidence:
#: every kernel/pipeline file, the sharded formulations they run under, and
#: the files that fix decode-affecting DEFAULTS and protocol constants —
#: a default flip (e.g. scan_decimation, max_survivors) changes what the
#: battery measured just as surely as a kernel edit does.
_HASHED = ("ops/*.py", "parallel/sharding.py", "parallel/multihost.py",
           "config.py", "constants.py")


def ops_content_hash() -> str:
    """sha256 over the compute-path sources (sorted paths, contents)."""
    h = hashlib.sha256()
    files: list[pathlib.Path] = []
    for pat in _HASHED:
        files.extend(_PKG.glob(pat))
    for f in sorted(files):
        h.update(str(f.relative_to(_PKG)).encode())
        h.update(b"\0")
        h.update(f.read_bytes())
    return h.hexdigest()[:16]


def git_revision() -> tuple[str, bool]:
    """(short sha, dirty?) of the repo, or ("unknown", False) outside git."""
    try:
        sha = subprocess.run(
            ["git", "-C", str(_REPO), "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "-C", str(_REPO), "status", "--porcelain",
             "--untracked-files=no"],
            capture_output=True, text=True, timeout=10).stdout.strip())
        return (sha or "unknown", dirty)
    except Exception:
        return ("unknown", False)


def provenance() -> dict:
    """Stamp for evidence JSONs: {git_sha, git_dirty, ops_hash}."""
    sha, dirty = git_revision()
    return {"git_sha": sha, "git_dirty": dirty,
            "ops_hash": ops_content_hash()}
