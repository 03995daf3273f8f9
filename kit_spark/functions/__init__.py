"""kit_spark.functions subpackage."""
