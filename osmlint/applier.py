# -*- coding: utf-8 -*-
"""Fix applier: the apply half of the plan/apply split (reference fix mode,
src/main.py:192-196 + src/engine.py:37-46).

The reference writes to OSM through ``osmapi`` with ``changesetauto``
batching (20 edits per changeset) from a single interactive thread.  Here
the applier is a SINGLE writer actor (``concurrency=1`` — OSM edits are
globally ordered per changeset) consuming the deterministic ``fixes``
dataset in streamed batches and buffering edits into changesets of
``batch_size``.  The network client is stubbed: no osmapi in this
environment and live writes are out of parity scope — ``dry_run`` (the
default, and the only mode wired) records every would-be edit plus the
changeset boundaries to a JSONL log, exactly what the reference's
``--dry-run`` flag suppresses at the last step (e.g. src/checks.py:285)."""

from __future__ import annotations

import json

import ray

CHANGESET_TAGS = {"comment": "Serbian lint bot fixes", "bot": "yes"}


@ray.remote
class OsmWriterActor:
    """Buffered changeset writer (single instance; the reference's
    osmapi(changesetauto=True, changesetautosize=N) equivalent)."""

    def __init__(self, log_path: str, batch_size: int = 20,
                 dry_run: bool = True):
        if not dry_run:
            raise NotImplementedError(
                "live OSM writes need osmapi + credentials; only the "
                "dry-run plan log is supported in this environment")
        self.log = open(log_path, "w")
        self.batch_size = batch_size
        self.changeset = 1
        self.in_changeset = 0
        self.total = 0

    def write_batch(self, rows: list[dict]) -> int:
        for r in rows:
            if self.in_changeset >= self.batch_size:
                self._flush_changeset()
            self.log.write(json.dumps({
                "changeset": self.changeset, "doc_id": r["doc_id"],
                "check": r["check_name"], "tag": r["tag"],
                "action": r["action"], "new_value": r["new_value"],
            }, ensure_ascii=False) + "\n")
            self.in_changeset += 1
            self.total += 1
        return self.total

    def _flush_changeset(self):
        self.changeset += 1
        self.in_changeset = 0

    def flush(self) -> dict:
        """Final flush (reference src/main.py:239-240)."""
        self.log.flush()
        self.log.close()
        return {"changesets": self.changeset, "edits": self.total}


def apply_fixes(fixes_ds, log_path: str, *, batch_size: int = 20,
                dry_run: bool = True) -> dict:
    """Stream the fixes dataset through the single writer actor."""
    actor = OsmWriterActor.remote(log_path, batch_size, dry_run)
    for batch in fixes_ds.iter_batches(batch_size=256, batch_format="pandas"):
        ray.get(actor.write_batch.remote(batch.to_dict("records")))
    return ray.get(actor.flush.remote())
