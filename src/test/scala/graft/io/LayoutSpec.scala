package graft.io

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.model.Tables

class LayoutSpec extends SparkSpec {

  test("compactDir shrinks file count, preserves rows and values") {
    import spark.implicits._
    val out = s"${sys.props("java.io.tmpdir")}/graft_compact_${System.nanoTime()}"
    // simulate append-heavy history: 6 tiny writes → ≥6 files
    (1 to 6).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("k", "v")
        .write.mode("append").parquet(out)
    }
    def parquetFiles = Files.list(Paths.get(out)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
    val before = parquetFiles
    assert(before >= 6)
    Layout.compactDir(spark, out) // tiny table → single target file
    assert(parquetFiles == 1, s"expected 1 compacted file, got $parquetFiles")
    val rows = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(rows == (1 to 6).map(i => (i.toLong, s"v$i")).toSet)
  }

  test("writeClustered produces hive dirs with per-file sorted sort keys") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_layout_${System.nanoTime()}"
    Layout.writeClustered(
      Tables.events(spark, sf).select("event_type", "event_id", "value"),
      out, partitionCols = Seq("event_type"), sortCols = Seq("value"))

    val dirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("event_type=")).toSeq
    assert(dirs.nonEmpty, "expected hive partition directories")

    val files = dirs.flatMap(d => Files.list(d).iterator().asScala)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    assert(files.nonEmpty)
    // every FILE must be internally sorted on the sort key — that is
    // what makes its row-group min/max stats selective
    files.foreach { f =>
      val vals = spark.read.parquet(f.toString)
        .select("value").collect().map(_.getDouble(0))
      assert(vals.sameElements(vals.sorted),
        s"file ${f.getFileName} not sorted on value")
    }
  }

  test("writeZOrdered: files stay narrow in BOTH dimensions (linear sort doesn't)") {
    import spark.implicits._
    // 64×64 grid, shuffled — hash order destroys any natural locality
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .sortBy { case (x, y) => (x * 2654435761L + y * 40503L) % 4099L }
    val df = grid.toDF("x", "y")
    val zOut = s"${sys.props("java.io.tmpdir")}/graft_z_${System.nanoTime()}"
    val linOut = s"${sys.props("java.io.tmpdir")}/graft_lin_${System.nanoTime()}"
    Layout.writeZOrdered(df, zOut, "x", "y", numFiles = 16, bits = 6)
    // baseline: linear sort by x only
    df.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linOut)
    def avgSpan(dir: String, c: String): Double = {
      val spans = Files.list(Paths.get(dir)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map { f =>
          val v = spark.read.parquet(f.toString).select(c)
            .collect().map(_.getInt(0))
          (v.max - v.min).toDouble
        }.toSeq
      spans.sum / spans.size
    }
    // rows preserved
    assert(spark.read.parquet(zOut).count() == 64L * 64L)
    val (zx, zy) = (avgSpan(zOut, "x"), avgSpan(zOut, "y"))
    val liny = avgSpan(linOut, "y")
    // z-order: each 256-row file covers a ~16×16 tile → span ≈ 15-16
    // per dimension; the x-sorted baseline leaves y spanning the full
    // 0..63 range in every file
    assert(zx < 32 && zy < 32,
      s"z-ordered files must be narrow in both dims: x=$zx y=$zy")
    assert(zy < liny / 1.5,
      s"z-order must beat linear sort on the NON-sort dim: $zy vs $liny")
  }

  test("zOrderValue survives wide column ranges (epoch-micros scale)") {
    import spark.implicits._
    // range ~2^50: the old long-arithmetic scaling ((x-lo)*top) wrapped
    // here at bits=16, producing garbage z-values
    val lo = 0L
    val hi = 1L << 50
    val pts = Seq(lo, hi / 4, hi / 2, (hi / 4) * 3, hi)
    val df = pts.map(v => (v, v)).toDF("a", "b")
    val z = Layout.zOrderValue($"a", $"b", lo, hi, lo, hi, bits = 16)
    val got = df.select(z.as("z"), $"a").orderBy("a")
      .collect().map(_.getLong(0))
    val maxZ = (1L << 32) - 1 // Morton of (65535, 65535)
    assert(got.forall(v => v >= 0L && v <= maxZ),
      s"z-values out of range: ${got.toSeq}")
    // on the diagonal, z must be strictly increasing with the inputs
    assert(got.sameElements(got.sorted) && got.distinct.length == got.length,
      s"diagonal z-values must be monotone: ${got.toSeq}")
    assert(got.last == maxZ, s"max point must interleave to all-ones: ${got.last}")
  }

  test("writeZOrdered: MEASURED row-group skipping on the non-sort dimension") {
    import spark.implicits._
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .sortBy { case (x, y) => (x * 2654435761L + y * 40503L) % 4099L }
    val df = grid.toDF("x", "y")
    val zOut = s"${sys.props("java.io.tmpdir")}/graft_zm_${System.nanoTime()}"
    val linOut = s"${sys.props("java.io.tmpdir")}/graft_lm_${System.nanoTime()}"
    Layout.writeZOrdered(df, zOut, "x", "y", numFiles = 16, bits = 6)
    df.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linOut)
    def rowsRead(dir: String) = graft.plans.ScanAudit.measure(
      spark.read.parquet(dir).filter($"y" >= 10 && $"y" <= 13)).rowsRead
    val (zRows, linRows) = (rowsRead(zOut), rowsRead(linOut))
    // x-sorted layout: y spans 0..63 in every row group → stats can't
    // prune, the scan emits everything. z-order: only the row groups
    // whose y-tile overlaps [10,13] survive.
    assert(linRows == 64L * 64L,
      s"linear layout must read the full table for a y filter: $linRows")
    assert(zRows <= linRows / 2,
      s"z-order must skip most row groups on y: $zRows vs $linRows")
  }

  test("writeClustered encodes parquet bloom filters for requested cols") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_bloom_${System.nanoTime()}"
    Layout.writeClustered(
      Tables.events(spark, sf).select("event_type", "event_id", "value"),
      out, partitionCols = Seq("event_type"), sortCols = Seq("value"),
      bloomFilterCols = Seq("event_id"))
    val file = Files.walk(Paths.get(out)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file.toString), conf))
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns.asScala
      val byName = cols.map(c => c.getPath.toDotString -> c).toMap
      assert(byName("event_id").getBloomFilterOffset >= 0,
        "event_id must carry a bloom filter")
      assert(byName("value").getBloomFilterOffset < 0,
        "unrequested column must not pay for a bloom filter")
    } finally reader.close()
  }
}
