from platform_etl_literature_spark.sources.io import (
    IOResource,
    IOResourceConfig,
    read_from,
    write_to,
)

__all__ = ["IOResource", "IOResourceConfig", "read_from", "write_to"]
