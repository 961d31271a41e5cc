package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TemporalJoins}

/** Scale probe for the temporal joins and the pair→cluster resolution:
  * synthesizes inputs 10-100× the test tables' size with deterministic
  * hash-spread columns (no rand streams), runs each operator fully
  * distributed, and checks a closed-form invariant of the result so a
  * fast-but-wrong run can't pass. Run:
  *   sbt "runMain graft.tools.TemporalScaleProbe [nEvents] [nNodes]"
  * Expect LINEAR wall-time in input size: as-of is one shuffle + sort
  * per key partition, range join is a bounded-fan-out equi-join, and
  * connected components is O(diameter) bounded-size rounds.
  * The probe caches the whole synthetic event table, so the 100M-event
  * configuration needs SPARK_DRIVER_MEM=48g (default heap is 8g).
  *
  * Two focused modes (results recorded in SCALE.md):
  *   sbt "runMain graft.tools.TemporalScaleProbe skew [nEvents]"
  * sweeps a planted hot key through 0→60% of all rows and times the
  * window-based [[TemporalJoins.asofBackward]] against the time-sliced
  * [[TemporalJoins.asofBackwardSliced]] on identical inputs (asserting
  * they agree row-for-row), locating the straggler knee where the
  * single-task window partition stops scaling;
  *   sbt "runMain graft.tools.TemporalScaleProbe chain [nNodes]"
  * labels ONE path graph of nNodes nodes — diameter = nNodes, the
  * adversarial case where hash-min's O(diameter) rounds are hopeless and
  * [[Dedup.connectedComponents]] must hand off to the O(log n)
  * large-star/small-star contraction.
  */
object TemporalScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("skew")) return skewMain(args.drop(1))
    if (args.headOption.contains("chain")) return chainMain(args.drop(1))
    val nEvents = if (args.length > 0) args(0).toLong else 10000000L
    val nNodes = if (args.length > 1) args(1).toLong else 4000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- events: ~20% purchases, ~20% views, 100k users, 30-day span --
    val horizon = 30L * 24 * 3600 * 1000000L
    val ev = spark.range(nEvents).select(col("id"),
      pmod(xxhash64(col("id")), lit(100000L)).as("user_id"),
      pmod(xxhash64(col("id"), lit(1)), lit(horizon)).as("t"),
      pmod(xxhash64(col("id"), lit(2)), lit(5)).as("kind"),
      (col("id") % 1000).cast("double").as("value")).cache()
    ev.count()

    val purchases = ev.filter(col("kind") === 0)
      .select(col("id").as("p_id"), col("user_id"), col("t"))
    val views = ev.filter(col("kind") === 1)
      .select(col("user_id"), col("id").as("v_id"), col("t"))

    val nPurch = purchases.count()
    val t0 = System.nanoTime()
    val asof = TemporalJoins.asofBackward(purchases, views, Seq("user_id"),
      leftTime = "t", rightTime = "t", tieBreak = "v_id")
    // two-sided invariants: every purchase row survives (left-outer),
    // no matched view is in the future, and matches actually happen
    // (with ~20k views per user over the horizon, a match-nothing
    // regression cannot hide)
    val a = asof.agg(count(lit(1)).as("n"),
      count(when(col("asof_t") > col("t"), 1)).as("bad"),
      count(col("asof_v_id")).as("matched")).head()
    val tAsof = (System.nanoTime() - t0) / 1e9
    require(a.getLong(0) == nPurch, "as-of dropped or duplicated left rows")
    require(a.getLong(1) == 0L, "as-of matched a future row")
    require(a.getLong(2) > nPurch / 2, "as-of matched implausibly few rows")

    val t1 = System.nanoTime()
    val errs = ev.filter(col("kind") === 2).select(col("id").as("e_id"),
      col("user_id"), (col("t") - 600000000L).as("lo"), (col("t") - 1L).as("hi"))
    val clicks = ev.filter(col("kind") === 3)
      .select(col("user_id"), col("t"), col("value"))
    val rj = TemporalJoins.rangeJoinBucketed(errs, "lo", "hi", clicks, "t",
      Seq("user_id"), bucketWidth = 600000000L)
    val r = rj.agg(count(lit(1)).as("pairs"),
      count(when(col("r_t") < col("lo") || col("r_t") > col("hi"), 1)).as("bad")).head()
    val tRange = (System.nanoTime() - t1) / 1e9
    require(r.getLong(1) == 0L, "range join matched outside the interval")
    // expectation: ~nClicks × (600s window / 30-day horizon) pairs per
    // error row's user — far above 0; a match-nothing regression fails
    require(r.getLong(0) > nEvents / 10000L, "range join matched implausibly few pairs")

    // ---- clusters of 4 consecutive ids: closed-form expected labels ---
    val t2 = System.nanoTime()
    val pairs = spark.range(nNodes).filter(col("id") % 4 =!= 3)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val cc = Dedup.connectedComponents(pairs)
    val c = cc.agg(count(lit(1)).as("n"),
      count(when(col("cluster") =!= (col("id") - pmod(col("id"), lit(4))), 1))
        .as("bad")).head()
    val tCc = (System.nanoTime() - t2) / 1e9
    require(c.getLong(1) == 0L, "connected components mislabeled a node")

    println(f"events=$nEvents%,d asof(${a.getLong(0)}%,d rows)=$tAsof%.1fs " +
      f"range(${r.getLong(0)}%,d pairs)=$tRange%.1fs  " +
      f"nodes=${c.getLong(0)}%,d cc=$tCc%.1fs")
    spark.stop()
  }

  /** Planted-Zipf sweep: hot-key share 0→60%, plain window shape vs the
    * time-sliced fallback on identical inputs. The two must agree
    * row-for-row (the equivalence that TemporalJoinsSuite proves on
    * fixtures, re-proven here at probe scale), and the timing pair
    * locates the knee where one key's history outgrows a fair task. */
  private def skewMain(args: Array[String]): Unit = {
    val nEvents = if (args.length > 0) args(0).toLong else 10000000L
    val spark = session()
    val horizon = 30L * 24 * 3600 * 1000000L
    for (hotPct <- Seq(0, 10, 30, 60)) {
      // hotPct% of rows land on user 0; the rest hash-spread over 100k
      val ev = spark.range(nEvents).select(col("id"),
        when(pmod(xxhash64(col("id"), lit(3)), lit(100)) < hotPct, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("user_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(horizon)).as("t"),
        pmod(xxhash64(col("id"), lit(2)), lit(5)).as("kind")).cache()
      ev.count()
      val purchases = ev.filter(col("kind") === 0)
        .select(col("id").as("p_id"), col("user_id"), col("t"))
      val views = ev.filter(col("kind") === 1)
        .select(col("user_id"), col("id").as("v_id"), col("t"))

      // XOR of row hashes: exact and order/partitioning-independent, so
      // plain-vs-sliced equality is a true row-set comparison
      def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
        val r = df.agg(count(lit(1)),
          count(col("asof_v_id")),
          expr("bit_xor(xxhash64(p_id, asof_v_id))")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val t0 = System.nanoTime()
      val plain = checksum(TemporalJoins.asofBackward(purchases, views,
        Seq("user_id"), "t", "t", tieBreak = "v_id"))
      val tPlain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val sliced = checksum(TemporalJoins.asofBackwardSliced(purchases, views,
        Seq("user_id"), "t", "t", tieBreak = "v_id",
        sliceWidth = horizon / 4096))
      val tSliced = (System.nanoTime() - t1) / 1e9
      require(plain == sliced,
        s"sliced as-of diverged from plain at hot=$hotPct%: $plain vs $sliced")
      println(f"hot=$hotPct%2d%% events=$nEvents%,d " +
        f"plain=$tPlain%.1fs sliced=$tSliced%.1fs")
      ev.unpersist()
    }
    spark.stop()
  }

  /** One path graph: diameter = nNodes. Hash-min alone would need
    * nNodes rounds; the probe passes only via the star-contraction
    * fallback's O(log n) rounds, and the closed-form labels (component
    * min = 0) catch any mislabeling. */
  private def chainMain(args: Array[String]): Unit = {
    val nNodes = if (args.length > 0) args(0).toLong else 1000000L
    val spark = session()
    val t0 = System.nanoTime()
    val pairs = spark.range(nNodes - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val cc = Dedup.connectedComponents(pairs)
    val c = cc.agg(count(lit(1)).as("n"),
      count(when(col("cluster") =!= 0L, 1)).as("bad")).head()
    val t = (System.nanoTime() - t0) / 1e9
    require(c.getLong(0) == nNodes, "chain cc dropped nodes")
    require(c.getLong(1) == 0L, "chain cc mislabeled a node")
    println(f"chain nodes=$nNodes%,d diameter=$nNodes%,d cc=$t%.1fs")
    spark.stop()
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
