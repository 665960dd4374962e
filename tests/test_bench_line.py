"""The driver's bounded tail capture truncates stdout lines >~2 KB, and a
truncated bench line records as ``"parsed": null`` for the whole round
(BENCH_r02). Pin that the one-line contract JSON bench.py emits stays
under bench.MAX_LINE for the REAL contract query set at worst-case value
widths, and that the fallback actually bounds pathological inputs."""
import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def _tiers(n):
    return [{"mult": 128 * 2 ** i, "ratio": 0.123 + i} for i in range(n)]


def test_real_contract_line_fits_untruncated():
    """Every current queries() name at a worst-case 7-char timing value
    (9999.99) must fit WITHOUT tripping the fallback — the per-query dict
    is the useful part of the line and should normally survive."""
    names = list(entry.queries())
    timings = {n: 9999.99 for n in names}
    out = bench.build_line(timings, total=99999.1234, sf=0.1, cpus=32,
                           duck_total=9999.99,
                           scaled={"mult": 128, "ratio": 0.456},
                           scaled_tiers=_tiers(3))
    assert len(out) < bench.MAX_LINE
    parsed = json.loads(out)
    assert parsed["queries"].keys() == timings.keys()
    assert parsed["metric"] == "contract_queries_total"
    assert parsed["scaled_trend"] == [[t["mult"], t["ratio"]]
                                      for t in _tiers(3)]


def test_pathological_line_falls_back_but_stays_bounded():
    timings = {f"op_very_long_operator_name_{i:03d}": 12345.67
               for i in range(200)}
    out = bench.build_line(timings, total=1.0, sf=0.1, cpus=32,
                           duck_total=1.0, scaled={}, scaled_tiers=_tiers(4))
    assert len(out) < bench.MAX_LINE
    assert json.loads(out)["queries"] == {"see": "BENCH_DETAIL.json"}
