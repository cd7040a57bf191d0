"""The committed dist zip must match the source tree byte-for-byte:
jobs/run_flagship.py ships it via spark-submit --py-files, so a stale
zip silently runs pre-fix code. Rebuild with `python tools/package.py`
whenever gtfs_osm_sync_spark/ changes."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZIP = os.path.join(REPO, "dist", "gtfs_osm_sync_spark.zip")
PKG = os.path.join(REPO, "gtfs_osm_sync_spark")


def _source_files() -> dict[str, bytes]:
    out = {}
    for root, _dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                with open(full, "rb") as fh:
                    out[os.path.relpath(full, REPO)] = fh.read()
    return out


def test_dist_zip_matches_source_tree():
    assert os.path.exists(ZIP), "dist zip missing — run python tools/package.py"
    src = _source_files()
    with zipfile.ZipFile(ZIP) as z:
        names = [n for n in z.namelist() if n.endswith(".py")]
        assert sorted(names) == sorted(src), (
            "zip file set diverges from source tree — rebuild with tools/package.py"
        )
        stale = [n for n in names if z.read(n) != src[n]]
    assert not stale, f"stale zip members (rebuild with tools/package.py): {stale}"


def test_no_compiled_artifacts_tracked():
    """No __pycache__/.pyc may be tracked by git or shipped in the zip
    (a compiled artifact can shadow edited source under --py-files)."""
    import subprocess

    tracked = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True
    ).stdout.splitlines()
    bad = [f for f in tracked if "__pycache__" in f or f.endswith(".pyc")]
    assert not bad, f"compiled artifacts tracked in git: {bad}"
    with zipfile.ZipFile(ZIP) as z:
        zbad = [n for n in z.namelist() if "__pycache__" in n or n.endswith(".pyc")]
    assert not zbad, f"compiled artifacts in dist zip: {zbad}"
