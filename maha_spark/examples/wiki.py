"""The reference's api-example wikiticker cube, re-registered.

Mirrors ``api-example/.../wiki/WikiRegistrationFactory.scala:26-109``:
a flat (dimension-table-free) Druid cube over wiki edit events with a
STRING-keyed static mapping (``namespace`` labels), a derived percentage
metric, a 20-day max window, and the event-timestamp-derived ``Day``
(DruidFuncDimCol DRUID_TIME_FORMAT -> a plain CAST here)."""

from __future__ import annotations

from ..core.columns import DerivedFactCol, DimCol, FactCol
from ..core.filters import (IN_BETWEEN_EQUALITY, IN_NOTIN_EQUALITY,
                            IN_NOTIN_EQUALITY_LIKE)
from ..core.grain import DAILY
from ..core.types import DateType, DecType, IntType, StaticMapping, StrType
from ..registry.cube import FactTable, PubCol, PublicFact, Registry

NAMESPACE_MAPPING = StaticMapping(
    {"Main": "Main Namespace", "User": "User Namespace",
     "Category": "Category Namespace", "User Talk": "User Talk Namespace"},
    "Unknown Namespace")


def build_wiki_registry() -> Registry:
    reg = Registry()
    cols = {
        "channel": DimCol("channel", StrType()),
        "cityName": DimCol("cityName", StrType()),
        "comment": DimCol("comment", StrType()),
        "countryIsoCode": DimCol("countryIsoCode", StrType(length=10)),
        "countryName": DimCol("countryName", StrType(length=100)),
        "isRobot": DimCol("isRobot", StrType(length=5)),
        "namespace": DimCol("namespace",
                            StrType(length=100,
                                    static_mapping=NAMESPACE_MAPPING)),
        "page": DimCol("page", StrType(length=100)),
        "regionName": DimCol("regionName", StrType(length=200)),
        "user": DimCol("user", StrType(length=200)),
        "event_time": DimCol("event_time", DateType(), is_day_column=True),
        "count": FactCol("count", IntType()),
        "added": FactCol("added", IntType()),
        "deleted": FactCol("deleted", IntType()),
        "delta": FactCol("delta", IntType()),
        "delta_percentage": DerivedFactCol(
            "delta_percentage", DecType(length=10, scale=8),
            expr="ROUND({delta} * 100.0 / {count}, 8)"),
    }
    reg.register_fact(PublicFact(
        name="wikiticker_stats",
        tables=[FactTable(name="wikipedia", columns=cols, grain=DAILY,
                          day_column="event_time", cost=500)],
        pub_cols=[
            PubCol("Day", "event_time", IN_BETWEEN_EQUALITY),
            PubCol("Wiki Channel", "channel", IN_NOTIN_EQUALITY),
            PubCol("City Name", "cityName", IN_NOTIN_EQUALITY_LIKE),
            PubCol("Country Name", "countryName", IN_NOTIN_EQUALITY_LIKE),
            PubCol("Is Robot", "isRobot", IN_NOTIN_EQUALITY),
            PubCol("Namespace", "namespace", IN_NOTIN_EQUALITY),
            PubCol("Page", "page", IN_NOTIN_EQUALITY),
            PubCol("Region Name", "regionName", IN_NOTIN_EQUALITY_LIKE),
            PubCol("User", "user", IN_NOTIN_EQUALITY),
        ],
        pub_fact_cols=[
            PubCol("Total Count", "count", IN_BETWEEN_EQUALITY),
            PubCol("Added Count", "added", IN_BETWEEN_EQUALITY),
            PubCol("Deleted Count", "deleted", IN_BETWEEN_EQUALITY),
            PubCol("Delta Count", "delta", IN_BETWEEN_EQUALITY),
            PubCol("Delta Percentage", "delta_percentage",
                   IN_BETWEEN_EQUALITY),
        ],
        max_days_window=20, max_days_lookback=9999,
        day_alias="Day"))
    return reg
