package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Behavior

/** Planted-truth scale leg for the behavioral-analytics family: a
  * synthetic event log big enough (default 20M users, ~41M events)
  * that any per-user materialization or second exchange would show up
  * in wall time, with funnel conversion counts known EXACTLY:
  *
  *  - every user views at t=u
  *  - u ≡ 0 (mod 2): clicks at t=u+1      → stage-2 = N/2
  *  - u ≡ 0 (mod 4): purchases at t=u+2   → stage-3 = N/4
  *  - u ≡ 2 (mod 4): purchases at t=u−1, BEFORE the view — these users
  *    DO view and click, so an unordered "has purchase" count would
  *    credit them; the ordered funnel must NOT
  *
  * Run: sbt "runMain graft.tools.BehaviorScaleProbe [nUsers]"
  */
object BehaviorScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[behavior-probe] $l: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val base = spark.range(n)
    val views = base.select(col("id").as("user_id"),
      timestamp_micros(col("id") * 1000000L + 1000000000L).as("ts"),
      lit("view").as("event_type"))
    val clicks = base.filter(col("id") % 2 === 0)
      .select(col("id").as("user_id"),
        timestamp_micros((col("id") + 1) * 1000000L + 1000000000L).as("ts"),
        lit("click").as("event_type"))
    val buys = base.filter(col("id") % 4 === 0)
      .select(col("id").as("user_id"),
        timestamp_micros((col("id") + 2) * 1000000L + 1000000000L).as("ts"),
        lit("purchase").as("event_type"))
    val decoys = base.filter(col("id") % 4 === 2)
      .select(col("id").as("user_id"),
        timestamp_micros((col("id") - 1) * 1000000L + 1000000000L).as("ts"),
        lit("purchase").as("event_type"))
    val events = views.unionByName(clicks).unionByName(buys)
      .unionByName(decoys)

    val counts = t(s"funnel over ~${n * 2} events")(
      Behavior.funnelCounts(events, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("stage_idx").collect())
    val got = counts.map(r => r.getInt(0) -> r.getLong(2)).toMap
    println(s"[behavior-probe] stages=${got.toSeq.sorted}")
    assert(got(1) == n, s"stage1 ${got(1)} != $n")
    assert(got(2) == n / 2, s"stage2 ${got(2)} != ${n / 2}")
    assert(got(3) == (n + 3) / 4, s"stage3 ${got(3)} != ${(n + 3) / 4}")

    val ret = t("retention census")(
      Behavior.retentionCohorts(events, "user_id", "ts")
        .agg(count(lit(1)).as("cells"), sum("n_users").as("total"))
        .collect().head)
    println(s"[behavior-probe] retention cells=${ret.getLong(0)} " +
      s"user-weeks=${ret.getLong(1)}")
    spark.stop()
  }
}
