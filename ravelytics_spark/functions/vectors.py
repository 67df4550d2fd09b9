"""Vector expressions over ``array<float>`` embedding columns.

All native higher-order functions (``zip_with``/``aggregate``/
``transform``) — JVM-side, no Python round-trip. At 100 TB the dot
product over a 64-dim column is a pure map operation: no shuffle, fully
pipelined with the scan, and column pruning means only the embedding +
id columns are read.

Computation is in DOUBLE with a sequential left-to-right fold, which is
deterministic for a given array order (floats: a+b+c is evaluation-order
dependent; a fold pins the order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double precision."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    """L2 norm."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 where either side has zero norm.

    Length mismatch between ``a`` and ``b`` also yields 0.0 (not an
    error): ``zip_with`` pads the shorter side with nulls, the null
    poisons the fold, and the zero-norm guard catches the null. The
    dim-taking operators (``srp_topk``/``pq_topk``/``ivf_pq_topk``)
    validate ``len(query_vec) == dim`` driver-side so the common misuse
    — a wrong-dimension query scoring every row 0.0 — fails loudly
    before a cluster-wide scan."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))
