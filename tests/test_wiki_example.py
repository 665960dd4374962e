"""Wikiticker example cube: string-keyed enum decode + reverse-map
filter, derived percentage, and the 20-day window cap."""

from __future__ import annotations

import datetime as dt

import pytest

DAY = {"field": "Day", "operator": "between",
       "from": "2020-01-01", "to": "2020-01-15"}


@pytest.fixture(scope="module")
def wiki_engine(spark):
    from maha_spark.engine import MahaSparkEngine
    from maha_spark.examples.wiki import build_wiki_registry
    from maha_spark.plans.binding import TableBinding

    d = dt.date(2020, 1, 10)
    rows = [
        # channel city comment iso country robot ns page region user day
        #   count added deleted delta
        ("#en", "SF", "", "US", "USA", "false", "Main", "p1", "CA",
         "u1", d, 10, 100, 20, 80),
        ("#en", "SF", "", "US", "USA", "false", "User", "p2", "CA",
         "u2", d, 5, 50, 25, 25),
        ("#de", "Berlin", "", "DE", "Germany", "true", "Weird", "p3",
         "BE", "u3", d, 4, 10, 10, 0),
    ]
    wiki = spark.createDataFrame(
        rows,
        "channel string, cityName string, comment string, "
        "countryIsoCode string, countryName string, isRobot string, "
        "namespace string, page string, regionName string, user string, "
        "event_time date, count long, added long, deleted long, "
        "delta long")
    binding = TableBinding(spark)
    binding.bind("wikipedia", lambda: wiki)
    return MahaSparkEngine(spark, build_wiki_registry(), binding)


def test_namespace_decode_and_delta_percentage(wiki_engine):
    out = wiki_engine.execute({
        "cube": "wikiticker_stats",
        "selectFields": [{"field": "Namespace"},
                         {"field": "Total Count"},
                         {"field": "Delta Percentage"}],
        "filterExpressions": [DAY],
    })
    got = {r[0]: (r[1], r[2]) for r in out["rows"]}
    assert got["Main Namespace"] == (10, 800.0)
    assert got["User Namespace"] == (5, 500.0)
    assert got["Unknown Namespace"] == (4, 0.0)  # unmapped -> default


def test_reverse_map_filter_on_string_enum(wiki_engine):
    out = wiki_engine.execute({
        "cube": "wikiticker_stats",
        "selectFields": [{"field": "Wiki Channel"},
                         {"field": "Added Count"}],
        "filterExpressions": [
            DAY, {"field": "Namespace", "operator": "in",
                  "values": ["Main Namespace", "User Namespace"]}],
    })
    assert [tuple(r) for r in out["rows"]] == [("#en", 150)]


def test_window_cap_20_days(wiki_engine):
    from maha_spark.request.request import ValidationError
    with pytest.raises(ValidationError, match="window"):
        wiki_engine.execute({
            "cube": "wikiticker_stats",
            "selectFields": [{"field": "Total Count"}],
            "filterExpressions": [
                {"field": "Day", "operator": "between",
                 "from": "2020-01-01", "to": "2020-02-15"}],
        })
