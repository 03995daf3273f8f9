"""kit_spark.streaming subpackage."""
