"""F1-F5 score semantics: Spark Column exprs vs independent scalar goldens.

Golden values below were hand-computed with the formulas of
/root/reference/FindDiseasePhenotypes2.groovy:30-55 (including the
nonstandard total^2 scaling in t/z-score and the log-of-log lgl).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pmcanalysis_spark.functions.scores import (
    lgl_py,
    lmi_py,
    npmi_py,
    score_columns,
    tscore_py,
    zscore_py,
)
from pmcanalysis_spark.oracle import approx_equal

CASES = [
    # (total, x, y, xy)
    (1000.0, 100.0, 50.0, 25.0),
    (1000.0, 100.0, 50.0, 1.0),
    (20.0, 10.0, 10.0, 10.0),   # xy == x == y (zero margins -> lgl NaN/NULL)
    (20.0, 10.0, 10.0, 5.0),
    (7.0, 3.0, 2.0, 1.0),
]


def test_npmi_golden():
    # manual: total=1000, x=100, y=50, xy=25
    # pmi = ln((25/1000)/((0.1)(0.05))) = ln(5); npmi = ln(5)/(-ln(0.025))
    assert math.isclose(npmi_py(1000, 100, 50, 25), math.log(5) / (-math.log(0.025)))


def test_tscore_golden_total_squared_quirk():
    # (25 - 100*50/1000^2)/sqrt(25) = (25 - 0.005)/5
    assert math.isclose(tscore_py(1000, 100, 50, 25), (25 - 0.005) / 5)


def test_zscore_golden():
    assert math.isclose(zscore_py(1000, 100, 50, 25), (25 - 0.005) / math.sqrt(0.005))


def test_lmi_golden():
    assert math.isclose(lmi_py(1000, 100, 50, 25), 25 * math.log(1000 * 25 / 5000))


def test_lgl_log_of_log_quirk():
    t, x, y, xy = 1000.0, 100.0, 50.0, 25.0
    lam = (
        t * math.log(t) - x * math.log(x) - y * math.log(y) + xy * math.log(xy)
        + (t - x - y + xy) * math.log(t - x - y + xy)
        + (x - xy) * math.log(x - xy) + (y - xy) * math.log(y - xy)
        - (t - x) * math.log(t - x) - (t - y) * math.log(t - y)
    )
    expected = 2 * math.log(lam)  # xy=25 > x*y/total=5 -> positive branch
    assert math.isclose(lgl_py(t, x, y, xy), expected)


def test_lgl_zero_margin_is_undefined():
    v = lgl_py(20, 10, 10, 10)  # x-xy = 0 -> 0*log(0) -> NaN
    assert math.isnan(v)


@pytest.mark.parametrize("case", CASES)
def test_spark_columns_match_python(spark, case):
    total, x, y, xy = case
    df = spark.createDataFrame([(x, y, xy)], "x double, y double, xy double")
    cols = score_columns(F.lit(total), F.col("x"), F.col("y"), F.col("xy"))
    row = df.select(*[v.alias(k) for k, v in cols.items()]).first()
    expected = {
        "tscore": tscore_py(total, x, y, xy),
        "zscore": zscore_py(total, x, y, xy),
        "lmi": lmi_py(total, x, y, xy),
        "npmi": npmi_py(total, x, y, xy),
        "lgl": lgl_py(total, x, y, xy),
    }
    for k, exp in expected.items():
        got = row[k]
        assert approx_equal(got, exp), f"{k}: spark={got} python={exp} case={case}"
