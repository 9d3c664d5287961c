"""Session-scoped scratch space for registered queries that
materialize streaming sinks / checkpoints / txn tables as part of
their plan.

Those queries return DataFrames that lazily READ from their scratch
dirs, so a per-query ``finally: rmtree`` is impossible — the caller
(driver, parity test) collects after the builder returns.  Before
r10 each site called ``tempfile.mkdtemp`` directly and never cleaned
up: every driver correctness pass and every local parity run left
~13 rollup/checkpoint dirs behind in /tmp.  All sites now allocate
under ONE process-scoped root that is removed at interpreter exit
(after every collect has happened), so a full parity run leaves /tmp
clean."""

from __future__ import annotations

import atexit
import shutil
import tempfile

_ROOT: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A fresh scratch directory under the session root (created on
    first use, rmtree'd at interpreter exit)."""
    if not _ROOT:
        root = tempfile.mkdtemp(prefix="dic_query_scratch_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _ROOT.append(root)
    return tempfile.mkdtemp(prefix=prefix, dir=_ROOT[0])
