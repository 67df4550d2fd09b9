"""Leaf registry module: the Query record, the live REGISTRY dict and
the ``q``/``_dsum`` helpers, with NO imports of any plan module.

Why a leaf: every plan module needs ``Query``/``q`` at its top, and
``queries.py`` (which also defines these historically) ends in an
import footer that loads every plan module — so a plan module imported
FIRST (e.g. ``pytest tests/test_round24_staged.py`` standalone) used
to re-enter ``queries`` mid-initialization and explode on any
cross-module constant import (round27 <- round24_staged._WIN_K, the
round-10 find). Plan modules now import these names from HERE (cycle
impossible); ``queries.py`` re-exports them, so the populated-catalog
import surface (``from ...queries import REGISTRY``) is unchanged —
REGISTRY is one shared dict object either way, but only importing
``queries`` guarantees it is fully populated.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    op_id: str  # SURVEY §2 operator id(s) this query certifies
    doc: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → harness-only (rows check)


REGISTRY: dict[str, Query] = {}


def q(name: str, op_id: str, doc: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Query(name, op_id, doc, fn, oracle)
        return fn

    return deco


def _dsum(col: Column | str, scale: int = 4) -> Column:
    """Hash-stable SUM of a double column: exact decimal accumulation,
    one IEEE-rounded cast back to double at the end."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(28,{scale})")).cast("double")


# DuckDB spelling of the same thing.
def _dsum_sql(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,{scale}))) AS DOUBLE)"
