package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stats.Replication

/** Scale leg for the Poisson bootstrap's ×R row expansion (r14-verdict
  * task 6): `poissonBootstrapMean` is the catalog's only
  * row-MULTIPLYING operator — every input row rides the grouped pass
  * R+1 times (a broadcast cross join against the replicate ids, then
  * ONE partial-aggregable groupBy with O(R) aggregate state: two
  * exact-decimal sums per replicate). The claims under test:
  *
  *  1. wall time is LINEAR in R (the expansion is the inherent cost;
  *     no super-linear term from state or shuffle) — measured at
  *     R = 25/50/100 over the same input, min-of-2 per point;
  *  2. state stays O(R), never O(N·R): the aggregate output is exactly
  *     R+1 rows regardless of input size, and the plan keeps the
  *     partial-aggregation split (map-side combine eats the expansion
  *     before the shuffle, so only tasks × (R+1) partial rows move);
  *  3. the expansion never materializes: the cross join is a broadcast
  *     of the R+1-row replicate frame against the streaming input scan
  *     (no CartesianProduct, no shuffle of expanded rows).
  *
  * Run: sbt "runMain graft.tools.BootstrapScaleProbe [nRows]"
  * (defaults to 10M rows → 1.01B expanded rows at R = 100).
  */
object BootstrapScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(1, n + 1).select(col("id"),
      (col("id") % 97).cast("double").as("y"),
      (lit(1.0) + (col("id") % 5).cast("double")).as("w"))

    // plan shape (claim 2+3): partial agg present, broadcast expansion,
    // no cartesian, no window
    val plan = Replication.poissonBootstrapMeanPlan(
      df, col("y"), col("w"), col("id"), reps = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      "bootstrap lost its map-side partial aggregation:\n" + plan.take(3000))
    assert(plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "replicate expansion must be a broadcast join:\n" + plan.take(3000))
    println("plan: partial-agg + broadcast expansion confirmed")

    def timeOnce(reps: Int): Double = {
      val t0 = System.nanoTime()
      val row = Replication.poissonBootstrapMean(
        df, col("y"), col("w"), col("id"), reps).head()
      val dt = (System.nanoTime() - t0) / 1e9
      val (m, nr, v) =
        (row.getDouble(0), row.getLong(1), row.getDouble(2))
      assert(nr == reps && !m.isNaN && v > 0.0 && !v.isNaN,
        s"degenerate bootstrap result at R=$reps: mean=$m var=$v")
      dt
    }
    val times = Seq(25, 50, 100).map { r =>
      val t = math.min(timeOnce(r), timeOnce(r)) // min-of-2 (bench policy)
      println(f"R=$r%3d: N=$n%,d -> ${(n * (r + 1)) / 1000000}%,d M " +
        f"expanded rows in $t%.1fs")
      r -> t
    }.toMap
    // linearity (claim 1): t(R) = a + b·R would give t(100)/t(25) = 4 at
    // a = 0; scan overhead only LOWERS the ratio. 5.0 allows host noise
    // while still rejecting anything super-linear in R.
    val ratio = times(100) / times(25)
    println(f"t(100)/t(25) = $ratio%.2f (linear target <= 4, cap 5)")
    assert(ratio <= 5.0, f"super-linear in R: ratio $ratio%.2f")
    spark.stop()
  }
}
