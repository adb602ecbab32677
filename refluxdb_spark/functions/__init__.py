from refluxdb_spark.functions.tsdb import date_bin, delta_per_series, rate_per_series

__all__ = ["date_bin", "delta_per_series", "rate_per_series"]
