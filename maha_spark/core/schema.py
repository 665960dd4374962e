"""Tenant schemas (maha `core/.../Schema.scala:8`).

A Schema is an access-control label (AdvertiserSchema, ResellerSchema...).
Facts/dims declare which schemas may query them, and per-schema required
filter aliases (fact/Fact.scala:1752 getCandidatesFor) — e.g. an
AdvertiserSchema request MUST filter on Advertiser ID. The planner injects
and validates these.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Schema:
    name: str

    def __str__(self) -> str:
        return self.name


# a few built-in labels used by examples/tests
ADVERTISER = Schema("advertiser")
RESELLER = Schema("reseller")
INTERNAL = Schema("internal")
STUDENT = Schema("student")
