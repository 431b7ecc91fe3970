"""Job-state metadata filesystem shim (round-4 verdict item 6).

The incremental plan's DRIVER-SIDE state — commit markers, ``covers.json``
manifests, ``job_config.json``, the clusters-reflect sidecar, batch-dir
listings — was written with bare ``open()``/``os.listdir``: correct in the
sandbox, but driver-local-only in production, where job state lives on an
object store or HDFS next to the stage tables. All of that IO now routes
through this shim:

- :class:`LocalStateFS` — the default; plain local-filesystem semantics,
  byte-identical behavior to the former direct calls.
- :class:`MemStateFS` — an object-store-like fake for tests: a flat blob
  map with S3-style prefix semantics (no real directories; ``isdir`` means
  "some key has this prefix", ``rmtree`` is a prefix delete, ``listdir``
  returns the distinct next path segments). Running the whole incremental
  flow through it proves no metadata decision secretly touches the local
  filesystem.

Stage DATA stays with Spark (``sources/writers.py`` already abstracts
stage IO over parquet paths vs Iceberg tables); this shim covers only the
small metadata files and listings around it. A production deployment
implements this five-method surface over its store (s3/abfs/gcs client or
a Hadoop FileSystem) — nothing in the plans layer changes.
"""

from __future__ import annotations

import os
import shutil


class LocalStateFS:
    """Local-filesystem implementation — the sandbox/driver-local default."""

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        with open(path, "w") as fh:
            fh.write(text)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path)


class MemStateFS:
    """In-memory object-store fake: flat ``{key: text}`` blobs, prefix
    semantics for directory-ish operations. ``read_text`` of a missing key
    raises ``FileNotFoundError`` (an ``OSError``, matching the local impl's
    contract that callers catch)."""

    def __init__(self) -> None:
        self.blobs: dict[str, str] = {}

    @staticmethod
    def _norm(path: str) -> str:
        return os.path.normpath(path)

    def read_text(self, path: str) -> str:
        key = self._norm(path)
        if key not in self.blobs:
            raise FileNotFoundError(key)
        return self.blobs[key]

    def write_text(self, path: str, text: str) -> None:
        self.blobs[self._norm(path)] = text

    def exists(self, path: str) -> bool:
        key = self._norm(path)
        return key in self.blobs or self.isdir(path)

    def isdir(self, path: str) -> bool:
        prefix = self._norm(path) + os.sep
        return any(k.startswith(prefix) for k in self.blobs)

    def listdir(self, path: str) -> list[str]:
        prefix = self._norm(path) + os.sep
        return sorted(
            {k[len(prefix):].split(os.sep, 1)[0] for k in self.blobs if k.startswith(prefix)}
        )

    def rmtree(self, path: str) -> None:
        key = self._norm(path)
        prefix = key + os.sep
        doomed = [k for k in self.blobs if k == key or k.startswith(prefix)]
        if not doomed:
            raise FileNotFoundError(key)
        for k in doomed:
            del self.blobs[k]
