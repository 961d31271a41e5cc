package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Cdc

/** A minimal versioned parquet table driven by CDC batches — the
  * apply-side of [[graft.operators.Cdc]] for Structured Streaming.
  *
  * Every applied batch writes a NEW immutable version directory
  * (`v=N`), sidestepping the read-while-overwrite hazard and giving
  * readers snapshot isolation for free (they pin the latest complete
  * version); old versions are retained for time travel until
  * [[vacuum]]. Because `applyChangeLog` is latest-(seq, op)-wins,
  * re-applying a redelivered batch reproduces the same version content
  * — the foreachBatch sink is therefore effectively exactly-once under
  * at-least-once delivery, which is the real-world streaming-CDC
  * contract. At scale the same layout works on any object store; the
  * version pointer is the NUMERICALLY-largest `v=N` directory (parsed
  * as an int — a lexicographic max would pin `v=9` over `v=10`).
  * Single-writer by contract: there is no cross-process commit lock,
  * so concurrent `applyBatch` callers can still race each other on the
  * same path (the foreachBatch sink satisfies this — Structured
  * Streaming serializes batches).
  */
object CdcTable {

  private def versionDirs(path: String): Seq[Int] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("v=") &&
        // only COMPLETE snapshots count: a crashed write leaves v=N
        // without the committer's _SUCCESS marker and must be invisible
        // to readers and to the next applyBatch
        new File(f, "_SUCCESS").exists())
      // toIntOption, not toInt: a foreign directory matching v=* (an
      // operator's `cp -r v=5 v=5.bak` carries _SUCCESS along) would
      // otherwise brick EVERY reader and the streaming sink with a
      // NumberFormatException until someone deletes it by hand —
      // non-numeric versions are simply not ours (r15 review)
      .flatMap(_.getName.stripPrefix("v=").toIntOption).toSeq.sorted

  def latestVersion(path: String): Option[Int] = versionDirs(path).lastOption

  def init(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(s"$path/v=0")

  def readLatest(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no versions under $path"))
    spark.read.parquet(s"$path/v=$v")
  }

  /** Apply one change batch: read the latest version, merge, write the
    * next version. Returns the new version number. The version is
    * resolved ONCE — listing the directory again for `next` would both
    * re-pay the listing and open a lost-update window where a version
    * committed in between is silently skipped over (its changes absent
    * from the new latest even though the merge never saw them). */
  def applyBatch(path: String, changes: DataFrame, keyCols: Seq[String],
                 seqCol: String, opCol: String): Int = {
    val spark = changes.sparkSession
    val v = latestVersion(path).getOrElse(
      throw new IllegalStateException(s"no versions under $path"))
    val base = spark.read.parquet(s"$path/v=$v")
    val next = v + 1
    Cdc.applyChangeLog(base, changes, keyCols, seqCol, opCol)
      .write.mode("overwrite").parquet(s"$path/v=$next")
    next
  }

  /** foreachBatch body for a streaming CDC source:
    * `stream.writeStream.foreachBatch(CdcTable.sink(path, keys, seq, op))`. */
  def sink(path: String, keyCols: Seq[String], seqCol: String,
           opCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) { applyBatch(path, batch, keyCols, seqCol, opCol); () }

  /** Drop all versions older than the latest. */
  def vacuum(path: String): Unit = {
    val vs = versionDirs(path)
    vs.dropRight(1).foreach { v =>
      org.apache.commons.io.FileUtils
        .deleteDirectory(new File(s"$path/v=$v"))
    }
  }
}
