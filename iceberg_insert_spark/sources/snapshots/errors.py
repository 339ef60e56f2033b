"""Commit-protocol error types shared by every snapshots submodule."""

class CommitConflict(RuntimeError):
    """A replace-type commit found the table advanced past the snapshot
    it planned against (Iceberg's optimistic-concurrency validation
    failure). The operation made no commit; re-run it against the
    current state."""

