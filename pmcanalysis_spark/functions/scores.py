"""Corpus-statistics association scores (SURVEY.md F1-F5).

Semantics replicated exactly from /root/reference/FindDiseasePhenotypes2.groovy:30-55,
including the two documented quirks we preserve bit-for-bit:

- tscore/zscore divide ``x*y`` by ``total*total`` (nonstandard; the usual
  formulation divides by ``total``) — F2/F3.
- lgl takes ``log`` of an already-log-space lambda sum ("log of log"), with
  sign flipped when ``xy < x*y/total`` — F5. NaN-producing for zero margins;
  preserved.

Two independent implementations:
- ``*_col``: Spark Column expressions (JVM-side, whole-stage codegen — the
  hot path; zero Python).
- ``*_py``: scalar pure-Python (math module) — used by the miniature oracle
  and as the independent golden source for unit tests.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------- Spark Column expressions (hot path) ----------

def npmi_col(total: Column, x: Column, y: Column, xy: Column) -> Column:
    pmi = F.log((xy / total) / ((x / total) * (y / total)))
    return pmi / (-1 * F.log(xy / total))


def tscore_col(total: Column, x: Column, y: Column, xy: Column) -> Column:
    return (xy - (x * y / (total * total))) / F.sqrt(xy)


def zscore_col(total: Column, x: Column, y: Column, xy: Column) -> Column:
    return (xy - (x * y / (total * total))) / F.sqrt(x * y / (total * total))


def lmi_col(total: Column, x: Column, y: Column, xy: Column) -> Column:
    return xy * F.log(total * xy / (x * y))


def lgl_col(total: Column, x: Column, y: Column, xy: Column) -> Column:
    lam = (
        total * F.log(total)
        - x * F.log(x)
        - y * F.log(y)
        + xy * F.log(xy)
        + (total - x - y + xy) * F.log(total - x - y + xy)
        + (x - xy) * F.log(x - xy)
        + (y - xy) * F.log(y - xy)
        - (total - x) * F.log(total - x)
        - (total - y) * F.log(total - y)
    )
    return F.when(xy < x * y / total, -2 * F.log(lam)).otherwise(2 * F.log(lam))


def score_columns(total: Column, x: Column, y: Column, xy: Column) -> dict[str, Column]:
    """All five scores, ready for ``df.withColumns``/select."""
    return {
        "tscore": tscore_col(total, x, y, xy),
        "zscore": zscore_col(total, x, y, xy),
        "lmi": lmi_col(total, x, y, xy),
        "npmi": npmi_col(total, x, y, xy),
        "lgl": lgl_col(total, x, y, xy),
    }


# ---------- pure-Python equivalents (oracle / goldens) ----------

def _safe_log(v: float) -> float:
    # mirrors java.lang.Math.log: log(0) = -inf, log(<0) = NaN
    if v > 0:
        return math.log(v)
    if v == 0:
        return float("-inf")
    return float("nan")


def npmi_py(total: float, x: float, y: float, xy: float) -> float:
    px, py, pxy = x / total, y / total, xy / total
    pmi = _safe_log(pxy / (px * py)) if px * py != 0 else float("nan")
    denom = -1 * _safe_log(pxy)
    if denom == 0:
        return float("nan")  # engine semantics: undefined (Spark yields NULL)
    return pmi / denom


def tscore_py(total: float, x: float, y: float, xy: float) -> float:
    denom = math.sqrt(xy)
    num = xy - (x * y / (total * total))
    if denom == 0:
        return float("nan")
    return num / denom


def zscore_py(total: float, x: float, y: float, xy: float) -> float:
    denom = math.sqrt(x * y / (total * total))
    num = xy - (x * y / (total * total))
    if denom == 0:
        return float("nan")
    return num / denom


def lmi_py(total: float, x: float, y: float, xy: float) -> float:
    if xy == 0:
        return float("nan")  # 0 * log(0) -> 0 * -inf = NaN in java double math
    return xy * _safe_log(total * xy / (x * y))


def lgl_py(total: float, x: float, y: float, xy: float) -> float:
    def xlog(v: float) -> float:
        lg = _safe_log(v)
        if v == 0:
            return float("nan")  # 0 * -inf
        return v * lg

    lam = (
        xlog(total)
        - xlog(x)
        - xlog(y)
        + xlog(xy)
        + xlog(total - x - y + xy)
        + xlog(x - xy)
        + xlog(y - xy)
        - xlog(total - x)
        - xlog(total - y)
    )
    sign_neg = xy < (x * y / total)
    val = 2 * _safe_log(lam) if lam == lam else float("nan")
    return -val if sign_neg else val
