"""Explicit table-version stamps — the object-store-safe invalidation
contract.

The engine's three read-side caches — the binding's DataFrame memo
(``plans/binding.py``), the data-skipping sidecar freshness gate
(``plans/skipping.py``), and the result-level cache
(``execution/result_cache.py``) — all need ONE question answered
cheaply: "has this table been rewritten since I last looked?".  They
previously keyed on the table ROOT's POSIX directory mtime, which a
100 TB deployment's actual storage (S3 / ABFS / GCS) does not have:
object-store "directories" are key prefixes with no mtime and no
``utime``, so every maintenance rewrite would silently stop
invalidating anything.

The contract is now an explicit ``_table_version`` stamp file in the
table root, written atomically (temp file + rename — and the leading
underscore keeps Spark's and pyarrow's parquet readers from treating
it as data, same convention as ``_SUCCESS``) by every
engine-maintained rewrite: ``overwrite_day_partitions`` and, through
it, compaction, Z-order, upsert, incremental rollup refresh — plus the
two primitives that only delete (row-level delete's emptied-day
removal and retention).  ``table_version`` reads the stamp, falling
back to the root mtime for tables no engine rewrite has ever stamped
(the driver's read-only testdata, external inputs) — mtime remains the
LOCAL-FILESYSTEM fallback, not the contract.

Monotonicity and mtime-compatibility: a new stamp is
``max(previous + 1e-3, wall clock at write)``.  Wall-clock seeding
keeps stamp values comparable with (and never smaller than) any mtime
a sidecar freshness record captured before the table's first stamp, so
a table transitions mtime -> stamp without ever appearing to move
backwards; the +1ms floor keeps rapid successive rewrites distinct
even under coarse filesystem clocks, while staying far above the 1e-6
comparison slack the staleness gates use and far below any realistic
rewrite rate (a stamp only outruns the wall clock if a table sustains
>1000 rewrites per second).

External writers that mutate day directories without going through the
engine's primitives must call ``bump_table_version`` themselves — the
same caller contract the mtime era documented, now with a portable
spelling.
"""

from __future__ import annotations

import os
import time

VERSION_FILE = "_table_version"


def _stamp_path(table_dir: str) -> str:
    return os.path.join(table_dir, VERSION_FILE)


def table_version(path: str) -> float:
    """Current version of the table at ``path``: the explicit
    ``_table_version`` stamp when present, else the root mtime (the
    local-filesystem fallback for never-stamped tables), else -1.0
    (missing path — distinct from every real version)."""
    try:
        with open(_stamp_path(path)) as f:
            return float(f.read().strip())
    except (OSError, ValueError):
        pass
    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0


def bump_table_version(table_dir: str) -> float:
    """Atomically record a new strictly-greater version for the table.

    Write-temp-then-rename makes a concurrent reader see either the old
    or the new stamp, never a partial one. The root mtime is also
    bumped (best-effort) so external mtime-based tooling on a local
    filesystem keeps seeing changes; on storage without ``utime`` the
    stamp alone carries the contract. Returns the new version (or -1.0
    when the table root does not exist — nothing to version)."""
    if not os.path.isdir(table_dir):
        return -1.0
    new = max(table_version(table_dir) + 1e-3, time.time())
    tmp = _stamp_path(table_dir) + ".tmp"
    try:
        with open(tmp, "w") as f:
            f.write(repr(new))
        os.replace(tmp, _stamp_path(table_dir))
    except OSError:
        return -1.0
    try:
        os.utime(table_dir, None)
    except OSError:
        pass
    return new
