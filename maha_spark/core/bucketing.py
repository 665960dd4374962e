"""Revision bucketing / A-B selection (bucketing/BucketingConfig.scala:19-207,
BucketSelector semantics).

A cube may be registered at several revisions; traffic is split by a
deterministic hash of the user id so a given user always sees the same
revision.  ``dry_run_pct`` additionally selects a shadow revision whose
query is built (and can be executed out-of-band) without serving it.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class CubeBucketConfig:
    """Percentage split across revisions for one cube.

    ``internal`` / ``external`` mirror the reference's per-user-type maps;
    percentages must sum to 100.
    """
    cube: str
    internal: dict[int, int] = field(default_factory=dict)
    external: dict[int, int] = field(default_factory=dict)
    dry_run: dict[int, int] = field(default_factory=dict)  # revision -> pct

    def __post_init__(self) -> None:
        for name in ("internal", "external"):
            m = getattr(self, name)
            if m and sum(m.values()) != 100:
                raise ValueError(
                    f"{name} bucket percentages for cube {self.cube!r} "
                    f"must sum to 100, got {sum(m.values())}")


@dataclass(frozen=True)
class BucketSelection:
    #: None -> caller should use the registry's default revision
    revision: Optional[int]
    dry_run_revision: Optional[int] = None


class BucketSelector:
    def __init__(self, configs: dict[str, CubeBucketConfig]):
        self.configs = configs

    @staticmethod
    def _slot(cube: str, user_id: str) -> int:
        """Deterministic 0-99 slot for (cube, user)."""
        h = hashlib.md5(f"{cube}:{user_id}".encode()).hexdigest()
        return int(h[:8], 16) % 100

    def select(self, cube: str, user_id: str = "",
               internal: bool = True,
               default_revision: Optional[int] = None) -> BucketSelection:
        cfg = self.configs.get(cube)
        if cfg is None:
            return BucketSelection(revision=default_revision)
        split = cfg.internal if internal else cfg.external
        rev = default_revision
        if split:
            slot = self._slot(cube, user_id)
            acc = 0
            for r, pct in sorted(split.items()):
                acc += pct
                if slot < acc:
                    rev = r
                    break
        dry = None
        if cfg.dry_run:
            slot = self._slot(f"{cube}:dryrun", user_id)
            acc = 0
            for r, pct in sorted(cfg.dry_run.items()):
                acc += pct
                if slot < acc:
                    dry = r
                    break
        return BucketSelection(revision=rev, dry_run_revision=dry)
