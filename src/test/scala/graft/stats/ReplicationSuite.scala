package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ReplicationSuite extends SparkSpec {
  import spark.implicits._

  // fixture: 9 rows, 3 PSUs, unequal weights
  private def fixture = Seq(
    (1.0, 1.0, 0), (2.0, 2.0, 0), (3.0, 1.5, 0),
    (4.0, 1.0, 1), (5.0, 0.5, 1), (6.0, 2.0, 1),
    (7.0, 1.0, 2), (8.0, 1.0, 2), (9.0, 3.0, 2)
  ).toDF("y", "w", "psu")

  /** The JK1 formulas recomputed with plain doubles on the driver. */
  private def expected(rows: Seq[(Double, Double, Int)])
      : (Double, Double, Double) = {
    val byPsu = rows.groupBy(_._3).toSeq.sortBy(_._1)
    val tg = byPsu.map(_._2.map(r => r._1 * r._2).sum)
    val wg = byPsu.map(_._2.map(_._2).sum)
    val (t, w, g) = (tg.sum, wg.sum, byPsu.size.toDouble)
    val theta = tg.zip(wg).map { case (a, b) => (t - a) / (w - b) }
    val bar = theta.sum / g
    val full = t / w
    val vj = (g - 1) / g * theta.map(x => (x - bar) * (x - bar)).sum
    val vm = (g - 1) / g * theta.map(x => (x - full) * (x - full)).sum
    (full, vj, vm)
  }

  test("jk1Mean matches the hand-computed JK1 formulas") {
    val r = Replication.jk1Mean(fixture, col("y"), col("w"), col("psu"))
      .head()
    val (mu, vj, vm) = expected(Seq(
      (1.0, 1.0, 0), (2.0, 2.0, 0), (3.0, 1.5, 0),
      (4.0, 1.0, 1), (5.0, 0.5, 1), (6.0, 2.0, 1),
      (7.0, 1.0, 2), (8.0, 1.0, 2), (9.0, 3.0, 2)))
    assert(math.abs(r.getAs[Double]("mean_y") - mu) < 1e-9)
    assert(r.getAs[Long]("g_psus") === 3L)
    assert(math.abs(r.getAs[Double]("var_jk") - vj) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_jk_mse") - vm) < 1e-9)
    // mse-centered variance dominates the replicate-mean-centered one
    assert(r.getAs[Double]("var_jk_mse") >= r.getAs[Double]("var_jk"))
  }

  test("jk1Mean construction runs exactly ONE distributed action " +
      "(the groupBy collect) — replicates never re-scan the data") {
    val n = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = n.incrementAndGet()
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = n.incrementAndGet()
    }
    spark.listenerManager.register(listener)
    try {
      Replication.jk1Mean(fixture, col("y"), col("w"), col("psu"))
      val deadline = System.nanoTime() + 5_000_000_000L
      var last = -1
      while (System.nanoTime() < deadline && n.get != last) {
        last = n.get; Thread.sleep(100)
      }
    } finally spark.listenerManager.unregister(listener)
    assert(n.get === 1, s"expected 1 action, saw ${n.get}")
  }

  test("jk1Mean is partition-invariant (bit-exact)") {
    val a = Replication.jk1Mean(fixture, col("y"), col("w"), col("psu"))
      .collect().toSeq
    val b = Replication.jk1Mean(fixture.repartition(7), col("y"), col("w"),
      col("psu")).collect().toSeq
    assert(a === b)
  }

  test("jk1Mean with one row per PSU equals the classic jackknife of " +
      "the unweighted mean") {
    // equal weights, PSU = row: JK1 reduces to the textbook delete-one
    // jackknife, whose variance for the mean is s²/n exactly
    val ys = Seq(2.0, 4.0, 9.0, 1.0, 7.0)
    val df = ys.zipWithIndex.map { case (y, i) => (y, 1.0, i) }
      .toDF("y", "w", "psu")
    val r = Replication.jk1Mean(df, col("y"), col("w"), col("psu")).head()
    val n = ys.size.toDouble
    val mu = ys.sum / n
    val s2 = ys.map(y => (y - mu) * (y - mu)).sum / (n - 1)
    assert(math.abs(r.getAs[Double]("var_jk") - s2 / n) < 1e-9)
  }
}
