package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Streams, UserEvent}

/** True-streaming execution leg for the stateful family (r16 verdict
  * item 7): the w-family grades BATCH renditions (the SURVEY §2.12
  * ruling) and StreamingSuite covers watermark semantics on small
  * fixtures, so until this probe the 100 TB claim for the streaming
  * stack rested on code-shape arguments alone. This runs w08's exact
  * operator — [[Streams.runningUserStats]], the flatMapGroupsWithState
  * Welford kernel — under the REAL micro-batch engine at ≥10M events
  * and pins the state-store size per trigger from the engine's own
  * StateOperatorProgress metrics.
  *
  * Shape: nEvents rows written as `nFiles` parquet files (distributed
  * generation — nothing driver-side), replayed by a file stream with
  * maxFilesPerTrigger=1 under Trigger.AvailableNow, so the engine
  * executes exactly `nFiles` stateful micro-batches with checkpointed
  * state between them. Planted truth:
  *
  *  - state is O(users), NOT O(events): ids are round-robin across
  *    files, so every trigger touches every user — numRowsTotal must
  *    equal nUsers from trigger 1 onward and stay EXACTLY FLAT while
  *    10M events stream past (the unbounded-state failure mode would
  *    show here as growth);
  *  - correctness across state round-trips: after the final trigger
  *    every user's running n must equal nEvents/nUsers exactly, and the
  *    Welford mean must equal the closed-form per-user mean (each
  *    user's values are a fixed residue-class sequence) — checked via
  *    the memory sink's last emission per user.
  *
  * Run: sbt "runMain graft.tools.StreamingScaleProbe [nEvents]"
  */
object StreamingScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val nUsers = 100000L
    val nFiles = 10
    val perUser = n / nUsers
    require(n % nUsers == 0, s"nEvents $n must be a multiple of $nUsers")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false") // streaming plans
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tag = spark.sparkContext.applicationId
      .replaceAll("[^a-zA-Z0-9]", "_")
    val dir = s"/tmp/graft_stream_probe_$tag"
    try {
      // value = (id % 997) / 9.97 — deterministic, per-user closed-form
      // arithmetic mean the checker below recomputes exactly. One
      // parquet part-file per CONTIGUOUS 1M-id block: any contiguous
      // n/nFiles block covers every user (block size is a multiple of
      // nUsers), so EVERY trigger updates EVERY user — the state-row
      // series must be exactly flat at nUsers from trigger 1. (A
      // round-robin repartition would NOT guarantee this: user ids
      // stride by nUsers, and nUsers ≡ 0 mod nFiles sends a user's
      // whole partition-local sequence to one file.)
      val blk = n / nFiles
      require(blk % nUsers == 0, "block size must be a multiple of nUsers")
      (0 until nFiles).foreach { f =>
        spark.range(f * blk, (f + 1) * blk)
          .select((col("id") % nUsers).as("user_id"),
            ((col("id") % 997L).cast("double") / lit(9.97)).as("value"))
          .coalesce(1)
          .write.mode("append").parquet(s"$dir/in")
      }

      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType)))
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/in")
        .select(col("user_id"), col("value")).as[UserEvent]

      val t0 = System.nanoTime()
      val q = Streams.runningUserStats(src)
        .writeStream.format("memory").queryName("probe_stats")
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val tQ = (System.nanoTime() - t0) / 1e9

      val progress = q.recentProgress.toSeq
        .filter(p => p.stateOperators.nonEmpty && p.numInputRows > 0)
      require(progress.size >= nFiles,
        s"expected >= $nFiles stateful triggers, saw ${progress.size}")
      println(f"runningUserStats: N=$n%,d events / $nUsers%,d users / " +
        f"${progress.size} triggers in $tQ%.1fs")
      progress.zipWithIndex.foreach { case (p, i) =>
        val so = p.stateOperators(0)
        println(f"  trigger $i%2d: rows=${p.numInputRows}%,9d  " +
          f"stateRows=${so.numRowsTotal}%,8d  " +
          f"stateUpdated=${so.numRowsUpdated}%,8d  " +
          f"stateMem=${so.memoryUsedBytes / 1048576.0}%7.1f MiB  " +
          f"batch=${p.batchDuration / 1000.0}%5.1fs")
      }
      // the bounded-state pin: O(users) rows, exactly flat across 10M
      // streamed events
      progress.foreach { p =>
        val rows = p.stateOperators(0).numRowsTotal
        assert(rows == nUsers,
          s"state rows $rows != $nUsers — state is not O(users)")
      }
      val memMb = progress.map(_.stateOperators(0).memoryUsedBytes).max / 1048576.0
      println(f"state store: flat at $nUsers%,d rows across all " +
        f"triggers; peak memory $memMb%.1f MiB")

      // correctness across checkpointed state round-trips: the LAST
      // emission per user carries the full-stream Welford result
      val last = spark.table("probe_stats")
        .groupBy("user_id").agg(max(col("n")).as("n"),
          max_by(col("mean"), col("n")).as("mean"))
      val badN = last.filter(col("n") =!= perUser).count()
      assert(badN == 0L, s"$badN users ended with n != $perUser")
      // closed-form per-user ARITHMETIC mean from the residue-class
      // sequence; Welford's result depends on arrival order only in
      // trailing ulps (~1e-13 relative on these magnitudes), so the
      // 1e-9 tolerance is four orders of slack without admitting any
      // real defect (a dropped or double-counted event moves the mean
      // by ~1e-2 here)
      val meanCheck = last.select(col("user_id"), col("mean")).as[(Long, Double)]
        .mapPartitions { it =>
          it.map { case (u, got) =>
            var sum = 0.0; var i = 0L
            while (i < perUser) {
              sum += ((u + i * nUsers) % 997L).toDouble / 9.97; i += 1
            }
            if (math.abs(sum / perUser - got) <= 1e-9) 0L else 1L
          }
        }.reduce(_ + _)
      assert(meanCheck == 0L,
        s"$meanCheck users diverged from the closed-form mean")
      println(f"correctness: all $nUsers%,d users at n=$perUser with " +
        "closed-form-exact means after " +
        f"${progress.size} checkpointed state round-trips")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      spark.stop()
    }
  }
}
