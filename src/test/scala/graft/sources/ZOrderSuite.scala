package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSuite extends SparkSpec {
  import spark.implicits._

  /** Reference bit-by-bit Morton interleave. */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    for (b <- 0 until 16)
      z |= (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
    z
  }

  test("zValue equals the bit-by-bit reference interleave") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(500)(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"mismatch at ($x, $y)")
    }
  }

  test("zValue raises on keys outside the 16-bit contract instead of " +
      "silently masking them (which destroys data-skipping)") {
    val wide = Seq((1700000000L, 5L), (1L, 2L)).toDF("x", "y")
    val e = intercept[Exception] {
      wide.select(ZOrder.zValue(col("x"), col("y"))).collect()
    }
    assert(e.getMessage.contains("16-bit contract"), e.getMessage)
    val neg = Seq((-1L, 2L)).toDF("x", "y")
    val e2 = intercept[Exception] {
      neg.select(ZOrder.zValue(col("x"), col("y"))).collect()
    }
    assert(e2.getMessage.contains("16-bit contract"), e2.getMessage)
  }

  test("z-clustered write gives every file a tight two-key bounding box") {
    // full 128×128 grid → 16 z-range files; ideal z ranges are 32×32
    // quadrants (area 1024 of 16384); range boundaries are sampled, so
    // assert each bbox covers ≤ 1/4 of the plane — a random or
    // single-key-sorted layout puts ~the full y-extent in every file.
    val n = 128
    val grid = spark.range(0L, (n * n).toLong).toDF("id")
      .withColumn("x", col("id") % n)
      .withColumn("y", expr(s"id div $n"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      ZOrder.writeZOrdered(grid, "x", "y", dir, numFiles = 16)
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length === 16)
      var total = 0L
      var areaSum = 0L
      files.foreach { f =>
        val bb = spark.read.parquet(f).agg(
          min("x"), max("x"), min("y"), max("y"), count(lit(1))).head()
        val area = (bb.getLong(1) - bb.getLong(0) + 1) *
          (bb.getLong(3) - bb.getLong(2) + 1)
        // ideal z ranges are 32×32 quadrants (area 1024); sampled range
        // boundaries can straddle one quadrant edge, never the plane
        assert(area <= (n * n) / 3,
          s"file bbox area $area is not local")
        areaSum += area
        total += bb.getLong(4)
      }
      assert(areaSum / files.length <= (n * n) / 8,
        s"mean bbox area ${areaSum / files.length} is not local")
      assert(total === (n * n).toLong) // nothing lost in the layout
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("r16: writeZOrdered refuses an input that already has '__z' " +
      "instead of silently dropping the caller's column") {
    import spark.implicits._
    val df = Seq((1L, 2L, 99L)).toDF("x", "y", "__z")
    val ex = intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(df, "x", "y", "/tmp/zorder-collision-test", 2)
    }
    assert(ex.getMessage.contains("__z"), ex.getMessage)
  }
}
