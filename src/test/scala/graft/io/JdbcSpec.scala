package graft.io

import graft.SparkSpec

/** S5 JDBC sink round-trip against embedded Derby (in-memory; the
  * derby jars ship with Spark). Covers the overwrite semantics and
  * batch options of Jdbc.write without a live PostgreSQL.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = Jdbc.JdbcConfig(
    url = "jdbc:derby:memory:graftdb;create=true",
    user = "", password = "",
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver",
    numPartitions = 2)

  test("write overwrites and reads back intact") {
    val df = Seq((1L, "Santiago", 30.5), (2L, "Valparaíso", 25.0))
      .toDF("id", "estacion", "valor")
    Jdbc.write(df, "vista_test", cfg)
    // overwrite with different content — old rows must vanish
    val df2 = Seq((3L, "Concepción", 18.0)).toDF("id", "estacion", "valor")
    Jdbc.write(df2, "vista_test", cfg)
    val back = Jdbc.read(spark, "vista_test", cfg)
    val rows = back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((3L, "Concepción", 18.0)))
  }
}
