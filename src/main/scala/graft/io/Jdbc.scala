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
}
