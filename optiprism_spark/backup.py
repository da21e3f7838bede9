"""Backup/restore — the reference's store backup re-expressed for a
lake-backed engine.

The reference serializes its whole store (parquet parts + metadata)
into a zlib-compressed archive with per-entry integrity checks and
restores it wholesale (storage/src/db.rs:1348-1546). The equivalent
state here is: the metadata catalog (sqlite), the ingest WAL, and the
table data directories (parquet). ``create_backup`` captures any
subset into one gzip tarball with a sha256 manifest; ``restore_backup``
verifies every entry against the manifest before handing paths back.

Scale note: at 100 TB the DATA backup belongs to the object store
(versioned buckets / Delta time travel), not a tarball — so data
dirs are optional here and the common production call archives just
the control plane (catalog + WAL), which is exactly the state the
lake cannot reproduce. The tar path still handles data dirs for
self-contained deployments and tests.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import io
import json
import os
import shutil
import sqlite3
import tarfile
from typing import Optional

from .catalog import Catalog

MANIFEST_NAME = "manifest.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def dump_catalog(catalog: Catalog, dest_file: str) -> None:
    """Consistent point-in-time copy of the catalog via the sqlite
    backup API — works for file-backed AND in-memory catalogs (a
    file copy would miss WAL pages and can't see :memory: at all)."""
    dest = sqlite3.connect(dest_file)
    try:
        with catalog._lock:
            catalog._db.backup(dest)
        dest.commit()
    finally:
        dest.close()


def create_backup(
    out_path: str,
    catalog: Optional[Catalog] = None,
    wal_dir: Optional[str] = None,
    data_dirs: Optional[dict[str, str]] = None,
) -> dict:
    """Archive catalog / WAL / data dirs into ``out_path`` (.tar.gz)
    with a sha256-per-entry manifest. Returns the manifest."""
    import tempfile

    files: dict[str, str] = {}  # archive name -> source path
    with tempfile.TemporaryDirectory() as tmp:
        if catalog is not None:
            cat_file = os.path.join(tmp, "catalog.db")
            dump_catalog(catalog, cat_file)
            files["catalog.db"] = cat_file
        out_dir = os.path.realpath(os.path.dirname(os.path.abspath(out_path)))
        if wal_dir is not None:
            snap_root = os.path.join(tmp, "wal_snapshot")
            for root, _, names in os.walk(wal_dir):
                # backups often live under wal_dir; never archive them.
                # Boundary-aware: a bare prefix test would also skip
                # sibling dirs like <out_dir>-archive.
                real = os.path.realpath(root)
                if real == out_dir or real.startswith(out_dir + os.sep):
                    continue
                for n in names:
                    src = os.path.join(root, n)
                    rel = os.path.relpath(src, wal_dir)
                    # SNAPSHOT the journal before hashing: the live
                    # WAL grows under concurrent ingest, and hashing
                    # the file then tar-adding it later would archive
                    # longer content than the manifest hash — every
                    # backup taken under load would fail restore
                    # verification. A mid-append copy at worst carries
                    # a torn tail, which replay already truncates.
                    dst = os.path.join(snap_root, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copy2(src, dst)
                    files[os.path.join("wal", rel)] = dst
        for name, d in (data_dirs or {}).items():
            if os.sep in name or name in ("..", "."):
                raise ValueError(f"data dir name {name!r} must be a plain name")
            for root, _, names in os.walk(d):
                for n in names:
                    src = os.path.join(root, n)
                    rel = os.path.relpath(src, d)
                    files[os.path.join("data", name, rel)] = src
        manifest = {
            "createdAt": dt.datetime.now(dt.timezone.utc).isoformat(),
            "entries": {arc: _sha256(src) for arc, src in sorted(files.items())},
        }
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with tarfile.open(out_path, "w:gz") as tar:
            blob = json.dumps(manifest, indent=1).encode()
            info = tarfile.TarInfo(MANIFEST_NAME)
            info.size = len(blob)
            tar.addfile(info, io.BytesIO(blob))
            for arc, src in sorted(files.items()):
                tar.add(src, arcname=arc)
    return manifest


def restore_backup(backup_path: str, dest_dir: str) -> dict:
    """Extract a backup into ``dest_dir`` (refusing path traversal),
    verify every entry's sha256 against the manifest, and return
    ``{"manifest": ..., "catalog": path|None, "wal_dir": path|None,
    "data_dirs": {name: path}}``. A hash mismatch raises — a corrupt
    backup must fail loudly, like the reference's crc path."""
    os.makedirs(dest_dir, exist_ok=True)
    with tarfile.open(backup_path, "r:gz") as tar:
        member = tar.getmember(MANIFEST_NAME)
        manifest = json.loads(tar.extractfile(member).read())
        for m in tar.getmembers():
            target = os.path.realpath(os.path.join(dest_dir, m.name))
            if not target.startswith(os.path.realpath(dest_dir) + os.sep):
                raise ValueError(f"backup entry escapes dest dir: {m.name!r}")
            if not (m.isfile() or m.isdir()):
                raise ValueError(f"unsupported backup entry type: {m.name!r}")
            # every file must be covered by the manifest's hashes — an
            # archive member outside the manifest (an injected WAL
            # segment, a second catalog) would otherwise restore
            # unverified, weaker than the reference's per-entry crc
            if m.isfile() and m.name != MANIFEST_NAME \
                    and m.name not in manifest["entries"]:
                raise ValueError(f"backup entry {m.name!r} not in manifest")
        tar.extractall(dest_dir, filter="data")
    for arc, digest in manifest["entries"].items():
        actual = _sha256(os.path.join(dest_dir, arc))
        if actual != digest:
            raise ValueError(f"backup entry {arc!r} failed integrity check")
    out = {"manifest": manifest, "catalog": None, "wal_dir": None, "data_dirs": {}}
    if "catalog.db" in manifest["entries"]:
        out["catalog"] = os.path.join(dest_dir, "catalog.db")
    if any(a.startswith("wal" + os.sep) for a in manifest["entries"]):
        out["wal_dir"] = os.path.join(dest_dir, "wal")
    for arc in manifest["entries"]:
        parts = arc.split(os.sep)
        if parts[0] == "data" and len(parts) > 1:
            out["data_dirs"].setdefault(parts[1], os.path.join(dest_dir, "data", parts[1]))
    return out
