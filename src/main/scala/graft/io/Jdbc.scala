package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC sink (SURVEY.md §2.1 S5) mirroring step 6's PostgreSQL load
  * (steps/step6_upload_to_db.py:111-142): create-or-replace semantics
  * (the reference DELETEs then `to_sql(if_exists='replace')` — net
  * effect is a full overwrite) with 1000-row batches (`chunksize=1000`
  * at :141 → `batchsize` here).
  *
  * At scale: `numPartitions` caps concurrent connections; writes
  * stream per-partition, nothing is collected to the driver.
  */
object Jdbc {

  final case class JdbcConfig(url: String, user: String, password: String,
                              driver: String = "org.postgresql.Driver",
                              batchSize: Int = 1000,
                              numPartitions: Int = 8)

  def write(df: DataFrame, table: String, cfg: JdbcConfig): Unit =
    df.write.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("batchsize", cfg.batchSize.toString)
      .option("numPartitions", cfg.numPartitions.toString)
      .option("isolationLevel", "READ_COMMITTED")
      .mode(SaveMode.Overwrite)
      .save()

  def read(spark: org.apache.spark.sql.SparkSession, table: String,
           cfg: JdbcConfig): DataFrame =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("dbtable", table)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .load()

  // ---- driver-local embedded path -----------------------------------
  //
  // [[write]]/[[read]] run distributed: every executor opens its own
  // connection, which is exactly right for a production NETWORK server
  // (PostgreSQL in the reference). An EMBEDDED database (in-memory
  // Derby, the only JDBC engine in this sandbox) is per-JVM: under a
  // multi-JVM master (`local-cluster`, a real cluster) each executor
  // would boot a private empty instance and the driver-side schema
  // probe a third — structurally unservable. These helpers keep the
  // Derby-backed harness query meaningful there: same overwrite
  // semantics, same `batchSize` batching, one JVM (the driver). Bounded
  // by construction — callers pass small aggregates; never use for bulk
  // loads (that is what the distributed [[write]] is for).

  private def sqlTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType => "VARCHAR(4096)"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => sys.error(s"embedded JDBC: unsupported type $other")
    }
  }

  def writeEmbedded(df: DataFrame, table: String, cfg: JdbcConfig): Unit = {
    java.lang.Class.forName(cfg.driver)
    val conn = java.sql.DriverManager.getConnection(cfg.url)
    try {
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table")
      catch {
        // swallow ONLY table-absent — a lock or permission failure
        // must surface here, not later as a baffling CREATE TABLE
        // error. Derby reports 42Y55 "does not exist" / 42X05 "no
        // such object"; H2/HSQLDB and most engines use the X/Open
        // states 42S02 / S0002. Only Derby is exercised in-tree (the
        // one embedded engine on the classpath), but the config is
        // engine-generic so accept the portable states too.
        case e: java.sql.SQLException
            if Set("42Y55", "42X05", "42S02", "S0002")
              .contains(e.getSQLState) => ()
      }
      val cols = df.schema.fields
        .map(f => s"${f.name} ${sqlTypeName(f.dataType)}").mkString(", ")
      st.executeUpdate(s"CREATE TABLE $table ($cols)")
      st.close()
      val ps = conn.prepareStatement(
        s"INSERT INTO $table VALUES (${df.schema.fields.map(_ => "?").mkString(",")})")
      var n = 0
      df.collect().foreach { row =>
        row.toSeq.zipWithIndex.foreach { case (v, i) =>
          ps.setObject(i + 1, v.asInstanceOf[AnyRef])
        }
        ps.addBatch(); n += 1
        if (n % cfg.batchSize == 0) ps.executeBatch()
      }
      ps.executeBatch(); ps.close()
    } finally conn.close()
  }

  def readEmbedded(spark: org.apache.spark.sql.SparkSession, table: String,
                   cfg: JdbcConfig): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    java.lang.Class.forName(cfg.driver)
    val conn = java.sql.DriverManager.getConnection(cfg.url)
    try {
      val rs = conn.createStatement().executeQuery(s"SELECT * FROM $table")
      val md = rs.getMetaData
      // mirror Spark's JDBC read mapping so the embedded path yields the
      // same schema the distributed JDBCRelation would
      val fields = (1 to md.getColumnCount).map { i =>
        val dt = md.getColumnType(i) match {
          case java.sql.Types.VARCHAR | java.sql.Types.CHAR |
               java.sql.Types.LONGVARCHAR => StringType
          case java.sql.Types.INTEGER => IntegerType
          case java.sql.Types.BIGINT => LongType
          case java.sql.Types.DOUBLE | java.sql.Types.FLOAT => DoubleType
          case java.sql.Types.REAL => FloatType
          case java.sql.Types.BOOLEAN => BooleanType
          case java.sql.Types.DATE => DateType
          case java.sql.Types.TIMESTAMP => TimestampType
          case java.sql.Types.DECIMAL | java.sql.Types.NUMERIC =>
            DecimalType(md.getPrecision(i), md.getScale(i))
          case other => sys.error(s"embedded JDBC: unsupported sql type $other")
        }
        StructField(md.getColumnName(i).toLowerCase, dt, nullable = true)
      }
      val schema = StructType(fields)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (rs.next()) {
        buf += Row.fromSeq(fields.indices.map { i =>
          val v = schema(i).dataType match {
            case d: DecimalType =>
              val bd = rs.getBigDecimal(i + 1)
              if (bd == null) null else Decimal(bd, d.precision, d.scale).toJavaBigDecimal
            case _ => rs.getObject(i + 1)
          }
          if (rs.wasNull()) null else v
        })
      }
      spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters
          .BufferHasAsJava(buf).asJava), schema)
    } finally conn.close()
  }
}
