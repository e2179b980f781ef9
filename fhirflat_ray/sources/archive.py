"""Archive compress/unpack for segment and parquet directories (SURVEY S8).

Mirrors the reference CLI's optional archive handling
(/root/reference/fhirflat/ingest.py:599-601 — ``shutil.make_archive`` over
the output folder then remove it — and ingest.py:618-621 — unpack a file
input next to itself before validating). This is an export / interchange
convenience for *small* results (a validated sample, a shared-dict store,
a snapshot manifest bundle): the 100 TB path stays directory-of-segments
in the object store, where per-partition resume and zone-pruned reads need
individually addressable files.
"""

from __future__ import annotations

import os
import shutil

#: formats shutil supports without optional deps (no JVM/zstd in this env)
ARCHIVE_FORMATS = ("zip", "tar", "gztar", "bztar", "xztar")

# longest-first so ``.tar.gz`` wins over ``.gz``
_SUFFIXES = (".tar.gz", ".tar.bz2", ".tar.xz", ".tgz", ".txz", ".zip", ".tar")


def compress_dir(directory: str, fmt: str, *, remove_source: bool = True) -> str:
    """Archive ``directory`` as ``directory.<ext>`` and (by default) remove
    the source dir, exactly as the reference does after a transform
    (ingest.py:599-601). Returns the archive path."""
    if fmt not in ARCHIVE_FORMATS:
        raise ValueError(f"unknown archive format {fmt!r}; one of {ARCHIVE_FORMATS}")
    directory = directory.rstrip("/")
    archive = shutil.make_archive(directory, fmt, directory)
    if remove_source:
        shutil.rmtree(directory)
    return archive


def is_archive(path: str) -> bool:
    """True if ``path`` is a file with a recognized archive suffix."""
    if not os.path.isfile(path):
        return False
    base = path.lower()
    return any(base.endswith(sfx) for sfx in _SUFFIXES)


def strip_archive_suffix(path: str) -> str:
    base = path.lower()
    for sfx in _SUFFIXES:
        if base.endswith(sfx):
            return path[: -len(sfx)]
    return path


#: marker file recording which archive (size+mtime) an extraction came from
_MARKER = ".unpacked-from"


def maybe_unpack(path: str) -> str:
    """If ``path`` is an archive file, unpack it next to itself (reference
    ingest.py:618-621: ``with_suffix("")`` sibling dir) and return the
    extracted directory; otherwise return ``path`` unchanged.

    Crash-safe and staleness-safe: extraction lands in a temp sibling that
    is atomically renamed into place with a marker recording the source
    archive's size+mtime, so a kill mid-unpack never leaves a reusable
    partial directory, and a regenerated archive re-extracts instead of
    silently serving the old contents."""
    if not is_archive(path):
        return path
    directory = strip_archive_suffix(path)
    st = os.stat(path)
    token = f"{st.st_size}:{st.st_mtime_ns}"
    marker = os.path.join(directory, _MARKER)
    if os.path.isdir(directory):
        try:
            with open(marker) as f:
                if f.read() == token:
                    return directory  # complete extraction of THIS archive
        except OSError:
            # No marker: a foreign directory we must not destroy. Stale
            # marker: our own prior extraction of an older archive — safe
            # to replace.
            if os.listdir(directory):
                raise FileExistsError(
                    f"extraction target {directory!r} exists and was not "
                    f"created by unpacking {path!r} — remove it, or pass "
                    "the directory itself instead of the archive"
                ) from None
        shutil.rmtree(directory)
    tmp = f"{directory}.unpacking.{os.getpid()}"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    shutil.unpack_archive(path, extract_dir=tmp)
    with open(os.path.join(tmp, _MARKER), "w") as f:
        f.write(token)
    os.rename(tmp, directory)
    return directory
