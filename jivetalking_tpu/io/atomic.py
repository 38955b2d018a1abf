"""Atomic artefact publishing: unique sibling dot-temp + rename.

Every artefact writer (FLAC delivery, reports, run records, sidecars,
spectrograms) publishes through here so the three contracts the reference
pins all hold at one place (ref: internal/processor/file_write.go:13-47,
createSiblingTempPath + publishOutput, processor_test.go:64-256):

  * the temp is a SIBLING of the target (same filesystem — the rename is
    atomic) and its name is UNIQUE per writer (mkstemp reservation), so
    concurrent publishes to the same destination are last-writer-wins with
    each payload complete, never a torn file
    (ref: TestPublishOutputConcurrentOverwrite, processor_test.go:175);
  * a failed publish cleans its temp — no dot-temp residue on any error
    path (ref: the RemovesTemp family, normalise_test.go:573-937);
  * a rename failure surfaces wrapped with the destination path
    (ref: TestPublishOutputWrapsRenameError, processor_test.go:227).
"""

from __future__ import annotations

import contextlib
import os
import tempfile


def sibling_temp_path(target: str, marker: str = "tmp") -> str:
    """Reserve a unique 0-byte temp next to `target`; the name carries the
    marker and stays dot-prefixed/.tmp-suffixed so residue scans (and the
    no-residue tests) recognise it (ref: createSiblingTempPath,
    processor_test.go:64-107)."""
    if os.sep in marker or (os.altsep and os.altsep in marker):
        raise ValueError(
            f"sibling temp marker must not contain a path separator: {marker!r}"
        )  # ref: TestCreateSiblingStatsPathRejectsSeparatorMarker,
        #    file_write_test.go:41-48
    d = os.path.dirname(target) or "."
    base = os.path.basename(target)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=f".{base}.{marker}-",
                               suffix=".tmp")
    os.close(fd)
    return tmp


@contextlib.contextmanager
def atomic_publish(target: str, marker: str = "tmp"):
    """Context manager yielding the temp path to write; publishes on clean
    exit, cleans the temp on ANY failure (including a failed rename, which
    re-raises wrapped with the destination path)."""
    tmp = sibling_temp_path(target, marker)
    try:
        yield tmp
        try:
            os.replace(tmp, target)
        except OSError as e:
            raise OSError(
                f"failed to publish output to {target}: {e}") from e
    finally:
        if os.path.exists(tmp):
            with contextlib.suppress(OSError):
                os.unlink(tmp)
