"""kit_spark.plans subpackage."""
