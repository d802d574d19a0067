from spectraplex_spark.sources.io import (
    idempotent_append,
    read_bronze_jsonl,
    write_bronze,
    write_jsonl,
    write_silver,
)

__all__ = [
    "idempotent_append",
    "read_bronze_jsonl",
    "write_bronze",
    "write_jsonl",
    "write_silver",
]
