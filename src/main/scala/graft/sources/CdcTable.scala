package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Cdc

/** A minimal versioned parquet table driven by CDC batches — the
  * apply-side of [[graft.operators.Cdc]] for Structured Streaming.
  *
  * Every applied batch writes a NEW immutable version directory
  * (`v=N`), sidestepping the read-while-overwrite hazard and giving
  * readers snapshot isolation (they pin the latest complete version);
  * old versions are retained for time travel until [[vacuum]]. Because
  * `applyChangeLog` is latest-(seq, op)-wins, re-applying a redelivered
  * batch reproduces the same version content — the foreachBatch sink is
  * therefore effectively exactly-once under at-least-once delivery,
  * which is the real-world streaming-CDC contract. All path operations
  * go through the Hadoop FileSystem API resolved from the session's
  * conf — java.io.File only resolves driver-local bare paths, so the
  * previous rendition was write-only on hdfs://, s3a://, and even
  * file:/ URIs (r16 review); the version pointer is the
  * NUMERICALLY-largest `v=N` directory (parsed as an int — a
  * lexicographic max would pin `v=9` over `v=10`).
  * Single-writer by contract: there is no cross-process commit lock,
  * so concurrent `applyBatch` callers can still race each other on the
  * same path (the foreachBatch sink satisfies this — Structured
  * Streaming serializes batches).
  */
object CdcTable {

  private def fsAndRoot(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  private def versionDirs(spark: SparkSession, path: String): Seq[Int] = {
    val (fs, root) = fsAndRoot(spark, path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v=") &&
        // only COMPLETE snapshots count: a crashed write leaves v=N
        // without the committer's _SUCCESS marker and must be invisible
        // to readers and to the next applyBatch
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      // toIntOption, not toInt: a foreign directory matching v=* (an
      // operator's `cp -r v=5 v=5.bak` carries _SUCCESS along) would
      // otherwise brick EVERY reader and the streaming sink with a
      // NumberFormatException until someone deletes it by hand —
      // non-numeric versions are simply not ours (r15 review)
      .flatMap(_.getPath.getName.stripPrefix("v=").toIntOption).sorted
  }

  /** Largest complete version, resolved via the ACTIVE session's Hadoop
    * conf (the signature predates the FS migration; every caller has a
    * session on the thread). */
  def latestVersion(path: String): Option[Int] =
    versionDirs(SparkSession.active, path).lastOption

  /** (Re-)initialize the table at `path` with `df` as version 0,
    * deleting any higher versions: init means "this is the table now" —
    * a rendition that only overwrote v=0 left v=1.. intact, so
    * readLatest kept serving the stale highest version and the new data
    * never became visible (r16 review).
    *
    * CRASH SAFETY: the new snapshot is WRITTEN as a fresh version ABOVE
    * every existing one, the old versions are deleted only after that
    * write commits, and the committed snapshot is then renamed to v=0
    * (an atomic metadata op). Two earlier renditions each had a loss
    * window this ordering closes: delete-everything-then-write left
    * ZERO complete versions if the write failed (total loss), and
    * overwrite-v=0-in-place (the r16 reorder) still cleared the OLD
    * v=0 contents before the new commit — total loss whenever v=0 was
    * the only version (r17 review). Here every crash point leaves a
    * readable table: before the commit, the prior versions are
    * untouched; after it, readLatest serves the NEW data (at its
    * temporary high number until the rename lands, which the next
    * successful init renumbers). */
  def init(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val (fs, root) = fsAndRoot(spark, path)
    val prior = versionDirs(spark, path)
    val newV = prior.lastOption.map(_ + 1).getOrElse(0)
    df.write.mode("overwrite").parquet(s"$path/v=$newV")
    prior.foreach(v => fs.delete(new Path(root, s"v=$v"), true))
    if (newV != 0) {
      // an INCOMPLETE v=0 leftover (invisible to versionDirs, so not in
      // `prior`) would make the rename fail — clear it first
      val zero = new Path(root, "v=0")
      if (fs.exists(zero)) fs.delete(zero, true)
      require(fs.rename(new Path(root, s"v=$newV"), zero),
        s"CdcTable.init: rename v=$newV -> v=0 failed under $path " +
          "(the table is intact at v=" + newV + ")")
    }
  }

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
    * `stream.writeStream.foreachBatch(CdcTable.sink(path, keys, seq, op))`.
    * The batch is persisted for the trigger: the isEmpty probe plus the
    * two plan branches in applyChangeLog (winner keys, applied payload)
    * would otherwise re-read the source up to three times per trigger —
    * the exact case Spark's foreachBatch docs call out for persist. */
  def sink(path: String, keyCols: Seq[String], seqCol: String,
           opCol: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, _: Long) => {
      batch.persist()
      try {
        if (!batch.isEmpty) { applyBatch(path, batch, keyCols, seqCol, opCol); () }
      } finally batch.unpersist(blocking = false)
    }

  /** Drop old versions, keeping the newest `keepLast` (default 1).
    *
    * CAVEAT — vacuum vs in-flight readers: a reader that pinned v=N via
    * [[readLatest]] holds a LAZY plan; if vacuum deletes v=N before the
    * reader's action runs, that action fails with FileNotFoundException
    * (there is no reference counting — same operational contract as
    * lakehouse VACUUM retention). Run vacuum only beyond the longest
    * reader horizon, or keep extra versions via `keepLast`. */
  def vacuum(path: String, keepLast: Int = 1): Unit = {
    require(keepLast >= 1, s"keepLast=$keepLast must be >= 1")
    val spark = SparkSession.active
    val (fs, root) = fsAndRoot(spark, path)
    versionDirs(spark, path).dropRight(keepLast).foreach { v =>
      fs.delete(new Path(root, s"v=$v"), true)
    }
  }
}
