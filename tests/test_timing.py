"""Timing/stats substrate (util.c analogue) unit coverage."""

import math

from cfd_proxy_tpu.utils.timing import IterationStats, format_stats_table


def test_stats_summary():
    s = IterationStats("bulk")
    for t in (0.003, 0.001, 0.002, 0.010):
        s.add(t)
    assert s.min == 0.001 and s.max == 0.010
    assert s.median == 0.0025
    assert abs(s.mean - 0.004) < 1e-12


def test_table_speedups():
    a = IterationStats("bulk"); a.add(0.002)
    b = IterationStats("early"); b.add(0.001)
    table = format_stats_table([a, b], ref="bulk")
    lines = table.splitlines()
    assert "variant" in lines[0]
    assert "2.00" in lines[2]   # early is 2x bulk


def test_nan_sample_propagates():
    s = IterationStats("tiny")
    s.add(float("nan"))
    assert math.isnan(s.median)
