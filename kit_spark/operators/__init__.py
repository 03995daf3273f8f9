"""kit_spark.operators subpackage."""
