"""kit_spark.sources subpackage."""
