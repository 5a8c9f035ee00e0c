"""Persisted cross-run state for the incremental operator family.

The incremental ops (``llm_dedup_near_incremental``,
``llm_pack_ffd_incremental``, ``graph_cc_incremental``) carry state
between "daily" runs: the MinHash banding table, the FFD run-compressed
bin table, and the CC node->label table. Each is persisted once per
(process, source dir) under the system tempdir by an ``ensure_*_store``
helper in its operator module.

This module owns the PATH DERIVATION for those stores (ADVICE r12 #1):
the original scheme keyed the on-disk name by ``basename(sf_dir)`` while
caching by ``abspath(sf_dir)``, so two distinct fixture dirs sharing a
basename in one process silently overwrote each other's store — and a
rewritten sf_dir kept serving the stale store. Both hazards are closed
here by deriving the filename from a sha1 of the ABSOLUTE path plus a
FINGERPRINT of the source dir contents (name/size/mtime of every file):

* distinct dirs with equal basenames -> distinct digests -> distinct
  stores;
* in-process rewrite of a source table -> new fingerprint -> new store
  path -> the ensure helper rebuilds instead of serving stale state.

100 TB note: in production these stores would live on durable shared
storage (object store / warehouse table) keyed by pipeline id, with the
compaction op (``maintenance_store_compact`` in operators/analytics.py)
run on the same cadence as the incremental jobs; the tempdir is the
sandbox stand-in. The derivation logic — content-addressed by source
identity, never by display name — is the part that carries over.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

__all__ = ["store_path", "source_fingerprint"]


def source_fingerprint(sf_dir: str) -> str:
    """sha1 over (name, size, mtime_ns) of every entry in ``sf_dir``.

    One ``os.scandir`` pass — no file contents are read, so this is
    O(#tables) regardless of data scale (the sf dirs hold ~10 parquet
    files; at 100 TB the equivalent is the table-format snapshot id).
    """
    root = os.path.abspath(sf_dir)
    parts = []
    with os.scandir(root) as it:
        for entry in sorted(it, key=lambda e: e.name):
            st = entry.stat()
            parts.append(f"{entry.name}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.sha1("|".join(parts).encode("utf-8")).hexdigest()[:12]


def store_path(kind: str, sf_dir: str) -> str:
    """Deterministic per-(process, source-identity) store location.

    ``kind`` is the store family (``sig`` / ``ffd`` / ``cc``). The
    digest covers abspath AND content fingerprint, so equal basenames
    cannot collide and rewritten sources cannot alias a stale store.
    """
    key = os.path.abspath(sf_dir)
    digest = hashlib.sha1(
        f"{key}|{source_fingerprint(key)}".encode("utf-8")
    ).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(),
        f"solarflare_{kind}_store_{digest}_{os.getpid()}",
    )
