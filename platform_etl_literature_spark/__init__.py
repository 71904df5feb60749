"""PySpark-native analytics engine with the capabilities of
opentargets/platform-etl-literature, rebuilt Spark-first.

Subpackages
-----------
functions   column-level primitives (harmonic fold, vector math, text norm)
operators   large-scale dataset operators (dedup, similarity, text stats)
sources     config-driven IO (read_from / write_to)
plans       the four reference pipeline steps (processing, embedding,
            vectors, evidence) re-expressed as DataFrame plans
streaming   Structured Streaming extensions over the events table
"""

__version__ = "0.1.0"
