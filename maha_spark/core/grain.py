"""Time grains (maha `core/.../Grain.scala:12-143`).

DailyGrain/HourlyGrain/MinuteGrain plus the magic time fields
(Day/Hour/Minute/Week/Month, Grain.scala:25) that map to date_trunc
expressions over the fact's day/timestamp column.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Grain:
    name: str
    trunc_unit: str  # date_trunc unit

    def trunc_sql(self, col_sql: str) -> str:
        return f"date_trunc('{self.trunc_unit}', {col_sql})"


DAILY = Grain("daily", "day")
HOURLY = Grain("hourly", "hour")
MINUTE = Grain("minute", "minute")

#: magic time aliases -> date_trunc unit (Grain.scala:25)
MAGIC_TIME_FIELDS = {
    "Day": "day",
    "Hour": "hour",
    "Minute": "minute",
    "Week": "week",
    "Month": "month",
}
