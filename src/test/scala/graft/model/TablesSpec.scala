package graft.model

import graft.SparkSpec

/** Table-loader error contracts shared by the batch and streaming
  * entry points.
  */
class TablesSpec extends SparkSpec {

  test("explainNanos rewraps the raw TIMESTAMP(NANOS) failure with the conf hint") {
    val raw = new RuntimeException(
      "Illegal Parquet type: INT64 (TIMESTAMP(NANOS,false))")
    val e = intercept[IllegalArgumentException] {
      Tables.explainNanos[Unit](throw raw)
    }
    assert(e.getMessage.contains("nanosAsLong"))
    assert(e.getCause eq raw)
  }

  test("explainNanos passes unrelated failures and results through untouched") {
    val other = new RuntimeException("file not found")
    assert(intercept[RuntimeException](
      Tables.explainNanos[Unit](throw other)) eq other)
    assert(Tables.explainNanos(42) == 42)
  }

  test("fileEventStream schema inference and batch events agree on the ts type") {
    val batch = Tables.events(spark, sf)
    val stream = graft.streaming.Streams.fileEventStream(spark, sf + "/events.parquet")
    assert(stream.schema("ts").dataType == batch.schema("ts").dataType)
  }
}
