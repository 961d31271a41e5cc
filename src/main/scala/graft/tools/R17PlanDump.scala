package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import graft.queries.Catalog

/** Optimization-round plan evidence: runs each named catalog query END
  * TO END (noop sink) with a QueryExecutionListener attached and writes
  * every action's EXECUTED formatted plan to
  * `plans/<round>/<query>_<suffix>.txt`.
  *
  * Why a listener instead of `df.explain`: the iterative operators
  * (graph censuses, CC dedup, selection ranks) materialize each round
  * and return a collected local relation, so the graded frame's own
  * plan is a LocalTableScan — the structurally interesting per-round
  * plans (the loop's join strategy, the exchange count) only exist as
  * the intermediate actions the loop itself runs. The listener records
  * the plan of every action the query ACTUALLY executed, final
  * AQE-resolved form included, so before/after claims ("the round join
  * is now a BroadcastHashJoin") are checkable against the real
  * execution rather than a hand-built replica.
  *
  * Usage:
  *   sbt "runMain graft.tools.R17PlanDump <suffix> <q1,q2,...> [outDir]"
  * e.g. suffix "after" at HEAD, "before" in a worktree at the previous
  * round's graded commit. Unknown query names are skipped with a note
  * (new queries have no "before").
  */
object R17PlanDump {
  private val maxPlanChars = 7000
  private val maxPlansPerQuery = 24

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length >= 2,
      "usage: R17PlanDump <suffix> <q1,q2,...> [outDir] [sfDir]")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val outDir = if (args.length >= 3) args(2) else "plans/r17"
    val sf = if (args.length >= 4) args(3) else "/root/testdata/sf0.001"
    Files.createDirectories(Paths.get(outDir))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        plans.add(funcName -> qe.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })
    names.foreach { name =>
      Catalog.queries.get(name) match {
        case None =>
          println(s"[plandump] $name: not in this tree's catalog — skipped")
        case Some(fn) =>
          plans.clear()
          fn(spark, sf).write.format("noop").mode("overwrite").save()
          // the listener bus is async: under load a fixed sleep could
          // let late events from this query land after the next
          // query's clear() and be misattributed (r17 advice). Poll
          // until the captured-plan count is stable for two
          // consecutive 300 ms checks (bounded at 9 s).
          var last = -1
          var stable = 0
          var waited = 0
          while (stable < 2 && waited < 30) {
            Thread.sleep(300)
            waited += 1
            val n = plans.size()
            if (n == last) stable += 1 else { stable = 0; last = n }
          }
          graft.util.QueryLeases.releaseAll()
          val sb = new StringBuilder
          sb.append(s"# $name — executed plans ($suffix), sf=$sf\n")
          sb.append(s"# Captured by graft.tools.R17PlanDump: one entry per\n")
          sb.append(s"# Dataset action the query ran (loop rounds appear as\n")
          sb.append(s"# successive actions). Plans over ${maxPlanChars} chars are\n")
          sb.append(s"# truncated; at most ${maxPlansPerQuery} plans kept.\n")
          val snap = plans.toArray(Array.empty[(String, String)])
          val kept = snap.take(maxPlansPerQuery)
          kept.zipWithIndex.foreach { case ((fname, p), i) =>
            sb.append(s"\n## action ${i + 1}/${snap.length}: $fname\n\n")
            sb.append(p.take(maxPlanChars))
            if (p.length > maxPlanChars) sb.append("\n... [truncated]")
            sb.append("\n")
          }
          if (snap.length > kept.length)
            sb.append(s"\n## (${snap.length - kept.length} further actions " +
              "omitted — same loop shapes repeating)\n")
          val f = Paths.get(outDir, s"${name}_$suffix.txt")
          Files.writeString(f, sb.toString)
          println(s"[plandump] $name: ${snap.length} plans -> $f")
      }
    }
    spark.stop()
  }
}
