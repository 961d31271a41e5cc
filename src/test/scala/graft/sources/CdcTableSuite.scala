package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Cdc

case class Change(k: Long, op: String, seq: Long, v: String)

class CdcTableSuite extends SparkSpec {
  import spark.implicits._

  private def freshPath() =
    java.nio.file.Files.createTempDirectory("cdctable").toString + "/t"

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))

  test("foreign v=* directories are invisible, not fatal (a cp -r " +
      "v=5 v=5.bak backup used to NumberFormatException every reader)") {
    val path = freshPath()
    CdcTable.init(base.toDF("k", "v"), path)
    // simulate an operator backup: a non-numeric v= dir carrying the
    // _SUCCESS marker along
    val bak = new java.io.File(path, "v=0.bak")
    assert(bak.mkdirs())
    assert(new java.io.File(bak, "_SUCCESS").createNewFile())
    assert(CdcTable.latestVersion(path) === Some(0))
    assert(CdcTable.readLatest(spark, path).count() === 3L)
  }

  test("batch-by-batch apply equals the one-shot merge; versions stack") {
    val path = freshPath()
    CdcTable.init(base.toDF("k", "v"), path)
    val b1 = Seq(Change(2L, "U", 1L, "b2"), Change(4L, "I", 1L, "d"))
    val b2 = Seq(Change(3L, "D", 2L, null), Change(2L, "U", 3L, "b3"))
    CdcTable.applyBatch(path, b1.toDF(), Seq("k"), "seq", "op")
    CdcTable.applyBatch(path, b2.toDF(), Seq("k"), "seq", "op")
    assert(CdcTable.latestVersion(path) === Some(2))
    val stepwise = CdcTable.readLatest(spark, path)
      .orderBy("k").as[(Long, String)].collect().toSeq
    val oneShot = Cdc.applyChangeLog(base.toDF("k", "v"),
        (b1 ++ b2).toDF(), Seq("k"), "seq", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(stepwise === oneShot)
    assert(stepwise === Seq((1L, "a"), (2L, "b3"), (4L, "d")))
  }

  test("redelivered batch reproduces the same content (exactly-once effect)") {
    val path = freshPath()
    CdcTable.init(base.toDF("k", "v"), path)
    val b = Seq(Change(1L, "U", 5L, "a2"), Change(3L, "D", 5L, null))
    CdcTable.applyBatch(path, b.toDF(), Seq("k"), "seq", "op")
    val once = CdcTable.readLatest(spark, path)
      .orderBy("k").as[(Long, String)].collect().toSeq
    CdcTable.applyBatch(path, b.toDF(), Seq("k"), "seq", "op") // redelivery
    val twice = CdcTable.readLatest(spark, path)
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(twice === once)
    CdcTable.vacuum(path)
    assert(CdcTable.latestVersion(path) === Some(2))
    assert(CdcTable.readLatest(spark, path)
      .orderBy("k").as[(Long, String)].collect().toSeq === once)
  }

  test("foreachBatch sink applies a streaming change feed") {
    val path = freshPath()
    CdcTable.init(base.toDF("k", "v"), path)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Change]
    val q = mem.toDF().writeStream
      .foreachBatch(CdcTable.sink(path, Seq("k"), "seq", "op"))
      .start()
    try {
      mem.addData(Change(2L, "U", 1L, "b2"))
      q.processAllAvailable()
      mem.addData(Change(2L, "U", 2L, "b3"), Change(5L, "I", 1L, "e"))
      q.processAllAvailable()
      val got = CdcTable.readLatest(spark, path)
        .orderBy("k").as[(Long, String)].collect().toSeq
      assert(got === Seq((1L, "a"), (2L, "b3"), (3L, "c"), (5L, "e")))
    } finally q.stop()
  }

  test("r16: paths resolve via Hadoop FS — a file:/ URI works; init " +
      "RESETS an existing table; vacuum keepLast retains a horizon") {
    // the java.io.File rendition returned latestVersion = None for the
    // URI form of the very directory it had just written (write-only
    // table on any non-local-bare path)
    val bare = freshPath()
    val path = "file:" + bare
    CdcTable.init(base.toDF("k", "v"), path)
    assert(CdcTable.latestVersion(path) === Some(0))
    assert(CdcTable.readLatest(spark, path).count() === 3L)
    // stack three more versions, then re-init: the old rendition only
    // overwrote v=0 and kept serving stale v=3
    (1 to 3).foreach { i =>
      CdcTable.applyBatch(path,
        Seq(Change(10L + i, "I", i.toLong, s"x$i")).toDF(),
        Seq("k"), "seq", "op")
    }
    assert(CdcTable.latestVersion(path) === Some(3))
    CdcTable.init(Seq((9L, "fresh")).toDF("k", "v"), path)
    assert(CdcTable.latestVersion(path) === Some(0))
    assert(CdcTable.readLatest(spark, path)
      .as[(Long, String)].collect().toSeq === Seq((9L, "fresh")))
    // keepLast: vacuum(keepLast = 2) must leave the two newest versions
    (1 to 3).foreach { i =>
      CdcTable.applyBatch(path,
        Seq(Change(20L + i, "I", i.toLong, s"y$i")).toDF(),
        Seq("k"), "seq", "op")
    }
    CdcTable.vacuum(path, keepLast = 2)
    assert(CdcTable.latestVersion(path) === Some(3))
    assert(new java.io.File(bare, "v=2").exists())
    assert(!new java.io.File(bare, "v=1").exists())
    val exK = intercept[IllegalArgumentException] {
      CdcTable.vacuum(path, keepLast = 0)
    }
    assert(exK.getMessage.contains("keepLast"))
  }

  test("r17: a FAILED init write leaves the prior table fully intact " +
      "(write-then-delete ordering)") {
    // the delete-first rendition removed every complete version BEFORE
    // the parquet commit, so a write failure mid-init destroyed the
    // prior table outright (r16 advice). Drive the failure with a
    // dataframe whose evaluation throws at write time.
    val path = freshPath()
    CdcTable.init(base.toDF("k", "v"), path)
    CdcTable.applyBatch(path, Seq(Change(7L, "I", 1L, "g")).toDF(),
      Seq("k"), "seq", "op")
    assert(CdcTable.latestVersion(path) === Some(1))
    val boom = org.apache.spark.sql.functions.udf((k: Long) =>
      if (k > 0) throw new RuntimeException("boom") else "x")
    val bad = base.toDF("k", "v")
      .withColumn("v", boom(org.apache.spark.sql.functions.col("k")))
    intercept[Exception] { CdcTable.init(bad, path) }
    // worst case is the OLD stale-read behavior: every prior complete
    // version still serves
    assert(CdcTable.latestVersion(path) === Some(1))
    assert(CdcTable.readLatest(spark, path).count() === 4L)
    // and a subsequent successful init fully repairs the table
    CdcTable.init(Seq((42L, "ok")).toDF("k", "v"), path)
    assert(CdcTable.latestVersion(path) === Some(0))
    assert(CdcTable.readLatest(spark, path)
      .as[(Long, String)].collect().toSeq === Seq((42L, "ok")))
  }

  test("r17: a FAILED re-init when v=0 is the ONLY version keeps the " +
      "old v=0 data (write-high-then-rename)") {
    // the r16 reorder (write v=0 first, delete v>0 after) still lost
    // the table in THIS case: mode("overwrite") on v=0 cleared the old
    // contents before the new commit, so a mid-write failure left zero
    // complete versions (r17 review). The write now lands at
    // latest+1 and only becomes v=0 by rename after the commit.
    val path = freshPath()
    CdcTable.init(base.toDF("k", "v"), path)
    assert(CdcTable.latestVersion(path) === Some(0))
    val boom = org.apache.spark.sql.functions.udf((k: Long) =>
      if (k > 0) throw new RuntimeException("boom") else "x")
    val bad = base.toDF("k", "v")
      .withColumn("v", boom(org.apache.spark.sql.functions.col("k")))
    intercept[Exception] { CdcTable.init(bad, path) }
    assert(CdcTable.latestVersion(path) === Some(0))
    assert(CdcTable.readLatest(spark, path)
      .as[(Long, String)].collect().toSet === base.toSet)
    // and the successful re-init replaces it as v=0 exactly
    CdcTable.init(Seq((9L, "z")).toDF("k", "v"), path)
    assert(CdcTable.latestVersion(path) === Some(0))
    assert(CdcTable.readLatest(spark, path)
      .as[(Long, String)].collect().toSeq === Seq((9L, "z")))
    assert(!new java.io.File(path, "v=1").exists())
  }
}
