"""Unit tests for the pure-math pieces of tools/scaling_bench.py.

The measurement itself needs a quiet box and ~30 min, so CI only pins
the aggregation arithmetic: efficiency definitions, paired-ratio
medians, and the report's headline-vs-stress framing.
"""

import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import scaling_bench as sb  # noqa: E402


def _mk_measure(levels, walls_lo, walls_hi, docs=1000):
    lo, hi = levels
    m = {
        "walls": {lo: walls_lo, hi: walls_hi},
        "docs": {lo: docs, hi: docs},
        "ratios": [
            (a / b) / (hi / lo) for a, b in zip(walls_lo, walls_hi)
        ],
    }
    for c in levels:
        m[c] = {"cpus": c, "walls": m["walls"][c], "docs": docs}
    return m


def test_pair_stats_perfect_scaling():
    levels = (4, 16)
    spark_m = _mk_measure(levels, [40.0, 40.0], [10.0, 10.0])
    ceil_m = _mk_measure(levels, [40.0, 40.0], [10.0, 10.0])
    st = sb._pair_stats(levels, spark_m, ceil_m, [1.0, 1.0])
    assert st["eff"] == 1.0 and st["ceiling"] == 1.0 and st["rel"] == 1.0
    assert st["json"]["raw_efficiency"] == 1.0
    # throughput: 1000 docs / best wall
    assert st["tp"][4] == 1000 / 40.0 and st["tp"][16] == 1000 / 10.0


def test_pair_stats_best_and_median_differ():
    levels = (8, 32)
    # one noisy hi wall: best-of uses min, median is robust to it
    spark_m = _mk_measure(levels, [20.0, 20.0, 20.0], [5.0, 5.0, 50.0])
    ceil_m = _mk_measure(levels, [20.0, 20.0, 20.0], [5.0, 5.0, 5.0])
    rels = [
        s / c for s, c in zip(spark_m["ratios"], ceil_m["ratios"])
    ]
    st = sb._pair_stats(levels, spark_m, ceil_m, rels)
    assert st["eff"] == 1.0  # best walls: 20 -> 5 at 4x cores
    assert st["eff_med"] == statistics.median(spark_m["ratios"]) == 1.0
    # the noisy pair's ratio (20/50)/4 = 0.1 is in the list but not the median
    assert min(spark_m["ratios"]) == (20.0 / 50.0) / 4
    assert st["json"]["median"]["raw_efficiency"] == 1.0


def test_pair_report_tags_headline_vs_stress():
    levels = (4, 16)
    m = _mk_measure(levels, [40.0], [12.5])
    st = sb._pair_stats(levels, m, m, [1.0])
    head = sb._pair_report(st, headline=True)
    stress = sb._pair_report(st, headline=False)
    assert "headline north-rule pair" in head
    assert "full-box stress pair" in stress
    assert "Raw scaling efficiency (4 -> 16 cores): best-of 0.800" in head


def test_level_pairs_parse():
    # default: headline 4,16 first then 8,32
    assert sb.LEVEL_PAIRS == ((4, 16), (8, 32))
    assert sb._parse_level_pairs("2,8") == ((2, 8),)
    assert sb._parse_level_pairs("4,16;8,32;16,32") == (
        (4, 16), (8, 32), (16, 32),
    )
    import pytest

    for bad in ("4", "4,16;", "16,4", "0,4", "1,2,3"):
        with pytest.raises(ValueError):
            sb._parse_level_pairs(bad)


def test_pair_stats_trimmed_drops_single_outlier():
    """The documented trim rule: symmetric truncated MEAN (drop
    exactly one lowest and one highest per-pair ratio, mean of the
    rest) — a single VM-noise outlier round must not drag the trimmed
    statistic."""
    levels = (4, 16)
    # three clean rounds at eff 0.85 and one 0.48 outlier
    walls_lo = [40.0, 40.0, 40.0, 40.0]
    walls_hi = [40.0 / (4 * 0.85)] * 3 + [40.0 / (4 * 0.48)]
    spark_m = _mk_measure(levels, walls_lo, walls_hi)
    ceil_m = _mk_measure(levels, walls_lo, [10.0] * 4)
    st = sb._pair_stats(levels, spark_m, ceil_m, [1.0] * 4)
    # truncated mean drops the 0.48 and one 0.85 -> mean of the rest
    assert abs(st["eff_trim"] - 0.85) < 1e-9
    # the plain mean would have been dragged to ~0.7575 by the outlier
    assert statistics.mean(spark_m["ratios"]) < 0.76
    assert st["json"]["trimmed"]["raw_efficiency"] == 0.85


def test_pair_stats_trimmed_is_plain_mean_below_four_rounds():
    levels = (4, 16)
    spark_m = _mk_measure(levels, [40.0, 40.0], [12.0, 10.0])
    ceil_m = _mk_measure(levels, [40.0, 40.0], [10.0, 10.0])
    st = sb._pair_stats(levels, spark_m, ceil_m, [1.0, 1.0])
    assert st["eff_trim"] == statistics.mean(spark_m["ratios"])


def test_stage_metric_table_renders_and_tolerates_missing():
    levels = (4, 16)
    spark_m = _mk_measure(levels, [40.0], [10.0])
    spark_m["metrics"] = {
        4: [{"wall": 40.0, "task_p50": 0.5, "task_max": 1.5, "gc_ms": 120}],
        16: [{"wall": 10.0, "n_tasks": 256}],  # stats missing -> dash
    }
    ceil_m = _mk_measure(levels, [40.0], [10.0])
    st = sb._pair_stats(levels, spark_m, ceil_m, [1.0])
    table = sb._stage_metric_table(st)
    assert "3.0x" in table and "120" in table and "—" in table
    # and the no-metrics path (unit-test measures) renders empty rows
    st2 = sb._pair_stats(levels, _mk_measure(levels, [4.0], [1.0]),
                         ceil_m, [1.0])
    assert sb._stage_metric_table(st2).count("\n") == 1
