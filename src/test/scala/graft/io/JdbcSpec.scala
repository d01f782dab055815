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
    // in-memory Derby is per-JVM: the distributed sink/source (the
    // production shape — executors connect to a network server) only
    // reaches it when executors share this JVM; under a multi-JVM
    // master (local-cluster) exercise the documented driver-local
    // embedded path instead, mirroring q_jdbc_roundtrip
    val inProcess = spark.sparkContext.isLocal
    def write(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      if (inProcess) Jdbc.write(df, t, cfg)
      else Jdbc.writeEmbedded(df, t, cfg)
    def read(t: String): org.apache.spark.sql.DataFrame =
      if (inProcess) Jdbc.read(spark, t, cfg)
      else Jdbc.readEmbedded(spark, t, cfg)
    val df = Seq((1L, "Santiago", 30.5), (2L, "Valparaíso", 25.0))
      .toDF("id", "estacion", "valor")
    write(df, "vista_test")
    // overwrite with different content — old rows must vanish
    val df2 = Seq((3L, "Concepción", 18.0)).toDF("id", "estacion", "valor")
    write(df2, "vista_test")
    val rows = read("vista_test").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((3L, "Concepción", 18.0)))
  }

  test("PRODUCTION write/read over the wire: executors → remote-JDBC bridge") {
    // the distributed paths (per-partition executor connections, batch
    // inserts, driver-side schema probe) against a NETWORK endpoint —
    // the remote-JDBC bridge fronting embedded Derby, since Spark
    // ships derby.jar but not the derbynet server. Under the
    // local-cluster gate the connecting JVMs are real executor
    // processes; the JDBC code running is Spark's own.
    RemoteJdbc.registerDialect()
    val server = new RemoteJdbc.Server(
      "jdbc:derby:memory:graftnet;create=true")
    val port = server.start()
    try {
      val netCfg = Jdbc.JdbcConfig(
        url = s"jdbc:graftremote://localhost:$port/",
        user = "", password = "",
        driver = classOf[RemoteJdbcDriver].getName,
        batchSize = 100, numPartitions = 2)
      val df = (1L to 500L).map(i => (i, s"name_$i", i * 1.5))
        .toDF("id", "name", "v").repartition(2)
      Jdbc.write(df, "net_roundtrip", netCfg)
      // overwrite semantics across the wire too
      Jdbc.write(df.filter($"id" <= 200L), "net_roundtrip", netCfg)
      val back = Jdbc.read(spark, "net_roundtrip", netCfg)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(back.length == 200, s"got ${back.length} rows")
      assert(back.sortBy(_._1).toSeq ==
        (1L to 200L).map(i => (i, s"name_$i", i * 1.5)))
    } finally server.stop()
  }

  test("embedded driver-local path: overwrite + typed read-back") {
    // always exercised (both masters): the multi-JVM harness path
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    Jdbc.writeEmbedded(df, "emb_test", cfg)
    Jdbc.writeEmbedded(df.filter($"id" === 2L), "emb_test", cfg)
    val back = Jdbc.readEmbedded(spark, "emb_test", cfg)
    assert(back.schema.fields.map(_.dataType.typeName).toSeq ==
      Seq("long", "string", "double"))
    assert(back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((2L, "b", 2.5)))
  }
}
