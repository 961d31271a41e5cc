package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of + range join semantics on planted fixtures: tie handling, outer
  * nulls, bucket-boundary inclusion, and partitioning invariance. */
class TemporalJoinsSuite extends SparkSpec {
  import spark.implicits._

  test("asofBackward: latest at-or-before, ties by max tieBreak, outer nulls") {
    val left = Seq( // (oid, key, t)
      (1L, "a", 100L), (2L, "a", 205L), (3L, "b", 50L), (4L, "c", 10L)
    ).toDF("oid", "key", "t")
    val right = Seq( // (key, rid, t, v): rid 12/13 tie at t=100
      ("a", 11L, 90L, 1.0), ("a", 12L, 100L, 2.0), ("a", 13L, 100L, 3.0),
      ("a", 14L, 201L, 4.0), ("b", 15L, 60L, 5.0)
    ).toDF("key", "rid", "t", "v")
    val out = TemporalJoins.asofBackward(left, right, Seq("key"),
        leftTime = "t", rightTime = "t", tieBreak = "rid")
      .select("oid", "asof_rid", "asof_v").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some(13L), Some(3.0)), // t=100 tie included, max rid wins
      (2L, Some(14L), Some(4.0)), // latest before 205
      (3L, None, None),           // b's only event is after t=50
      (4L, None, None)))          // key with no right rows at all
  }

  test("asofBackward is partitioning-invariant") {
    val left = spark.range(200).select(col("id"), (col("id") % 7).as("key"),
      (col("id") * 13 % 400).as("t"))
    val right = spark.range(300).select((col("id") % 7).as("key"),
      col("id").as("rid"), (col("id") * 11 % 400).as("t"),
      (col("id") * 1.5).as("v"))
    def run(parts: Int) = TemporalJoins.asofBackward(
        left.repartition(parts), right.repartition(parts), Seq("key"),
        "t", "t", tieBreak = "rid")
      .select("id", "asof_rid").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(run(1) === run(7))
  }

  test("asofBackwardSliced matches asofBackward on the tie/outer fixture, all widths") {
    val left = Seq(
      (1L, "a", 100L), (2L, "a", 205L), (3L, "b", 50L), (4L, "c", 10L)
    ).toDF("oid", "key", "t")
    val right = Seq(
      ("a", 11L, 90L, 1.0), ("a", 12L, 100L, 2.0), ("a", 13L, 100L, 3.0),
      ("a", 14L, 201L, 4.0), ("b", 15L, 60L, 5.0)
    ).toDF("key", "rid", "t", "v")
    // widths straddling every regime: sub-event, tie-splitting, one-slice
    for (w <- Seq(1L, 7L, 100L, 1000L)) {
      val out = TemporalJoins.asofBackwardSliced(left, right, Seq("key"),
          "t", "t", tieBreak = "rid", sliceWidth = w)
        .select("oid", "asof_rid", "asof_v")
        .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
      assert(out === Seq(
        (1L, Some(13L), Some(3.0)), (2L, Some(14L), Some(4.0)),
        (3L, None, None), (4L, None, None)), s"sliceWidth=$w")
    }
  }

  test("asofBackwardSliced ≡ asofBackward on dense random data, incl. negatives") {
    // negative times exercise the floor-division slice key; width 64 is
    // deliberately coprime-ish with the 13/11 stride patterns
    val left = spark.range(400).select(col("id"), (col("id") % 7).as("key"),
      (col("id") * 13 % 500 - 250).as("t"))
    val right = spark.range(600).select((col("id") % 7).as("key"),
      col("id").as("rid"), (col("id") * 11 % 500 - 250).as("t"),
      (col("id") * 1.5).as("v"))
    val want = TemporalJoins.asofBackward(left, right, Seq("key"), "t", "t",
        tieBreak = "rid")
      .select("id", "asof_rid", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    for (w <- Seq(3L, 64L, 10000L)) {
      val got = TemporalJoins.asofBackwardSliced(left, right, Seq("key"),
          "t", "t", tieBreak = "rid", sliceWidth = w)
        .select("id", "asof_rid", "asof_v")
        .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
      assert(got === want, s"sliceWidth=$w")
    }
  }

  test("asofBackwardSliced slice keys are exact beyond 2^53 (integer div)") {
    // timestamps where a double round-trip loses ulps: the old
    // double-divide slice could land a row one slice off. With integer
    // div, sliced must stay row-identical to the plain shape.
    val base = (1L << 60) // not representable territory for doubles ± small deltas
    val left = Seq((1L, "k", base + 5L), (2L, "k", base + 103L), (3L, "k", base - 97L))
      .toDF("oid", "key", "t")
    val right = Seq(("k", 11L, base + 3L, 1.0), ("k", 12L, base + 100L, 2.0),
      ("k", 13L, base - 100L, 3.0)).toDF("key", "rid", "t", "v")
    val want = TemporalJoins.asofBackward(left, right, Seq("key"), "t", "t",
        tieBreak = "rid")
      .select("oid", "asof_rid").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    for (w <- Seq(7L, 100L, 1000L)) {
      val got = TemporalJoins.asofBackwardSliced(left, right, Seq("key"),
          "t", "t", tieBreak = "rid", sliceWidth = w)
        .select("oid", "asof_rid").as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
      assert(got === want, s"sliceWidth=$w")
    }
  }

  test("rangeJoinBucketed: inclusive bounds, bucket-crossing, empty intervals") {
    val left = Seq( // (lid, key, lo, hi)
      (1L, "a", 10L, 20L),  // within one bucket
      (2L, "a", 95L, 210L), // spans 3 buckets of width 100
      (3L, "b", 30L, 20L)   // empty interval: matches nothing
    ).toDF("lid", "key", "lo", "hi")
    val right = Seq(
      ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 21L, 3.0), ("a", 95L, 4.0),
      ("a", 100L, 5.0), ("a", 210L, 6.0), ("a", 211L, 7.0), ("b", 25L, 8.0)
    ).toDF("key", "t", "v")
    val out = TemporalJoins.rangeJoinBucketed(left, "lo", "hi", right, "t",
        Seq("key"), bucketWidth = 100L)
      .select("lid", "r_t").as[(Long, Long)].collect().sorted
    assert(out === Seq( // both endpoints inclusive, each pair exactly once
      (1L, 10L), (1L, 20L), (2L, 95L), (2L, 100L), (2L, 210L)))
  }

  test("rangeJoinBucketed is exact on negative domains (truncating div is monotone)") {
    // intervals and points straddling zero: truncation toward zero makes
    // the zero bucket wider but both sides bucket identically, so the
    // result must equal a brute-force non-equi join
    val left = Seq((1L, "k", -12L, -8L), (2L, "k", -5L, 4L), (3L, "k", -30L, 30L))
      .toDF("lid", "key", "lo", "hi")
    val right = spark.range(81).select(lit("k").as("key"),
      (col("id") - 40).as("t"), col("id").cast("double").as("v"))
    val got = TemporalJoins.rangeJoinBucketed(left, "lo", "hi", right, "t",
        Seq("key"), bucketWidth = 10L)
      .select("lid", "r_t").as[(Long, Long)].collect().sorted.toSeq
    val want = left.join(right, Seq("key"))
      .filter(col("t").between(col("lo"), col("hi")))
      .select("lid", "t").as[(Long, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got.size === (5 + 10 + 61))
  }

  test("rangeJoinBucketed never duplicates a pair across buckets") {
    val left = Seq((1L, "k", 0L, 999L)).toDF("lid", "key", "lo", "hi")
    val right = spark.range(1000)
      .select(lit("k").as("key"), col("id").as("t"), col("id").cast("double").as("v"))
    val out = TemporalJoins.rangeJoinBucketed(left, "lo", "hi", right, "t",
      Seq("key"), bucketWidth = 10L) // interval covers 100 buckets
    assert(out.count() === 1000L)
    assert(out.select("r_t").distinct().count() === 1000L)
  }

  test("asofBackwardSliced keeps NULL-key rows identically to the plain " +
      "variant (window partitions group NULLs; the joins must be " +
      "null-safe)") {
    // the r14-review bug: the sliced variant's equi-joins used plain
    // equality, so NULL-key left rows vanished instead of matching
    // NULL-key right history as asofBackward's window does
    val left = Seq((1L, Option("a"), 100L), (2L, None: Option[String], 100L),
      (3L, None: Option[String], 40L)).toDF("oid", "key", "t")
    val right = Seq((Option("a"), 11L, 90L, 1.0),
      (None: Option[String], 12L, 50L, 2.0)).toDF("key", "rid", "t", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("oid", "asof_rid", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    val plain = rows(TemporalJoins.asofBackward(left, right, Seq("key"),
      "t", "t", "rid"))
    assert(plain === Seq((1L, Some(11L), Some(1.0)),
      (2L, Some(12L), Some(2.0)), // NULL key matches NULL-key history
      (3L, None, None)))          // NULL key, before its only right row
    for (w <- Seq(1L, 7L, 1000L))
      assert(rows(TemporalJoins.asofBackwardSliced(left, right, Seq("key"),
        "t", "t", "rid", sliceWidth = w)) === plain, s"width $w")
  }

  test("asofBackwardSliced keeps NULL-TIME rows identically to the " +
      "plain variant (slice(NULL) is NULL — the slice comparison must " +
      "be null-safe like the keys)") {
    // r15 review: the key comparisons were null-safe but the __slice
    // one used ===, so a NULL-time left row was dropped from the output
    // entirely (a row-count fork) and NULL-time right history landed in
    // an unreachable slice
    val left = Seq((1L, "a", Option(100L)), (2L, "a", None: Option[Long]))
      .toDF("oid", "key", "t")
    val right = Seq(("a", 11L, Option(90L), 1.0),
      ("a", 12L, None: Option[Long], 2.0)).toDF("key", "rid", "t", "v")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("oid", "asof_rid", "asof_v")
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    val plain = rows(TemporalJoins.asofBackward(left, right, Seq("key"),
      "t", "t", "rid"))
    // NULL time sorts first: row 1 matches rid 11 (t=90 <= 100); the
    // NULL-time left row sees only the NULL-time right row
    assert(plain === Seq((1L, Some(11L), Some(1.0)),
      (2L, Some(12L), Some(2.0))))
    for (w <- Seq(1L, 7L, 1000L))
      assert(rows(TemporalJoins.asofBackwardSliced(left, right, Seq("key"),
        "t", "t", "rid", sliceWidth = w)) === plain, s"width $w")
  }

  test("asofBackwardSliced accepts non-orderable payload columns (maps) " +
      "— max_by orders only (t, tieBreak), never the payload") {
    val left = Seq((1L, "a", 100L)).toDF("oid", "key", "t")
    val right = Seq(("a", 11L, 90L, Map("x" -> 1)), ("a", 12L, 95L, Map("y" -> 2)))
      .toDF("key", "rid", "t", "props")
    val out = TemporalJoins.asofBackwardSliced(left, right, Seq("key"),
        "t", "t", "rid", sliceWidth = 10L)
      .select("oid", "asof_rid", "asof_props")
      .as[(Long, Long, Map[String, Int])].collect().toSeq
    assert(out === Seq((1L, 12L, Map("y" -> 2))))
  }
}
