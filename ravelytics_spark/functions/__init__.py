"""Column-expression library: cleansing, arrays, text analysis, vectors.

All native ``pyspark.sql.functions`` compositions (JVM-side, codegen'd) —
no Python UDFs. The reference's per-record Python normalization and
ClickHouse lambda functions map here.
"""

from ravelytics_spark.functions.cleansing import (
    best_effort_timestamp,
    normalize_release_date,
    null_default,
)

__all__ = ["best_effort_timestamp", "normalize_release_date", "null_default"]
