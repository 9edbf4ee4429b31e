"""Exception parity with the reference
(/root/reference/entwiner/exceptions.py): NodeNotFound/EdgeNotFound for
strict point lookups, ImmutableGraphError for mutation attempts on
read-only views, UnrecognizedFileFormat for ingest."""

from __future__ import annotations


class NodeNotFound(ValueError):
    """Raised by strict node lookups (reference exceptions.py:8)."""


class EdgeNotFound(ValueError):
    """Raised by strict edge lookups."""


class ImmutableGraphError(Exception):
    """Raised when mutating a read-only graph view (reference
    exceptions.py:20)."""


class UnrecognizedFileFormat(ValueError):
    """Raised for unreadable ingest inputs (reference exceptions.py)."""


class ConcurrentWriteError(RuntimeError):
    """Raised by the versioned store when a writer's base version is
    no longer current at publish time (optimistic concurrency: re-read
    the store, re-apply the merge, retry)."""
