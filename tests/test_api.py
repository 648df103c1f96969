"""Q6-Q8 + S2 service-layer parity."""

from graphrag_incrementalknowledgegraphpipeline_for_llms_spark import datagen
from graphrag_incrementalknowledgegraphpipeline_for_llms_spark.plans import api, pipeline


def test_job_registry_success(spark):
    reg = api.JobRegistry()
    jid = reg.submit(lambda: spark.range(100).selectExpr("id", "id * 2 AS dbl"))
    s = reg.wait(jid, timeout=120)
    assert s.state == "SUCCEEDED" and s.rows == 100


def test_job_registry_failure(spark):
    reg = api.JobRegistry()
    jid = reg.submit(lambda: spark.sql("SELECT * FROM nonexistent_table_xyz"))
    s = reg.wait(jid, timeout=120)
    assert s.state == "FAILED" and "nonexistent_table_xyz" in (s.error or "")


def test_explain_trace_real_plan(spark):
    df = spark.range(10).selectExpr("id % 3 AS k").groupBy("k").count()
    trace = api.explain_trace(df)
    assert "HashAggregate" in trace["physical_plan"]
    assert trace["steps"]


def test_health():
    assert api.health() == "OK"


def test_verify_tables(spark, catalog):
    pipeline.run_pipeline(spark, datagen.pages_df(spark, 10), catalog)
    info = api.verify_tables(spark, catalog, ["nodes", "edges", "missing_table"])
    assert info["nodes"]["exists"] and info["nodes"]["rows"] > 0
    assert "label" in info["nodes"]["schema"]
    assert info["missing_table"] == {"exists": False}
