"""Column-level primitives, all JVM-side (built-in functions / HOFs).

No row-at-a-time Python UDFs live here: every function returns a Column
expression that stays inside whole-stage codegen.
"""

from platform_etl_literature_spark.functions.harmonic import (
    harmonic_sorted,
    harmonic_value,
    max_harmonic,
)
from platform_etl_literature_spark.functions.vectors import (
    array_cosine,
    array_dot,
    array_norm,
)

__all__ = [
    "harmonic_sorted",
    "harmonic_value",
    "max_harmonic",
    "array_cosine",
    "array_dot",
    "array_norm",
]
