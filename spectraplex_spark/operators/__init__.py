from spectraplex_spark.operators.normalize import normalize, parse_failures

__all__ = ["normalize", "parse_failures"]
