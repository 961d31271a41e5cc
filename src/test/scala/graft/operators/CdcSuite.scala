package graft.operators

import graft.SparkSpec

class CdcSuite extends SparkSpec {
  import spark.implicits._

  private lazy val base =
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")

  private lazy val changes = Seq(
    (2L, "U", 1L, "b2"),
    (2L, "U", 2L, "b3"),
    (3L, "U", 1L, "c2"),
    (3L, "D", 2L, null),
    (5L, "I", 1L, "e")
  ).toDF("k", "op", "seq", "v")

  private def applied =
    Cdc.applyChangeLog(base, changes, Seq("k"), "seq", "op")

  test("latest change per key wins; deletes drop; inserts appear") {
    val out = applied.orderBy("k").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "a"), (2L, "b3"), (4L, "d"), (5L, "e")))
  }

  test("a NULL key in the change log raises instead of silently " +
      "duplicating the row (updates can't anti-join their base row)") {
    val nullKey = Seq((Option(2L), "U", 1L, "b2"),
      (None: Option[Long], "U", 2L, "x")).toDF("k", "op", "seq", "v")
    val e = intercept[Exception] {
      Cdc.applyChangeLog(base, nullKey, Seq("k"), "seq", "op").collect()
    }
    assert(e.getMessage.contains("NULL in key column"), e.getMessage)
  }

  test("op is only a tie-break: same-seq U beats D") {
    val tie = Seq((4L, "D", 7L, null), (4L, "U", 7L, "d2"))
      .toDF("k", "op", "seq", "v")
    val out = Cdc.applyChangeLog(base, tie, Seq("k"), "seq", "op")
      .filter($"k" === 4L).as[(Long, String)].collect().toSeq
    assert(out === Seq((4L, "d2")))
  }

  test("result is invariant under change-log partitioning") {
    val a = applied.orderBy("k").collect().toSeq
    val b = Cdc.applyChangeLog(base, changes.repartition(7), Seq("k"), "seq", "op")
      .orderBy("k").collect().toSeq
    assert(a === b)
  }

  test("a change log missing payload columns fails loudly") {
    val bad = Seq((2L, "U", 1L)).toDF("k", "op", "seq")
    val e = intercept[IllegalArgumentException] {
      Cdc.applyChangeLog(base, bad, Seq("k"), "seq", "op")
    }
    assert(e.getMessage.contains("lacks columns"))
  }

  test("the base side is anti-joined, not shuffled, when keys broadcast") {
    val plan = applied.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.toLowerCase.contains("leftanti"))
  }

  test("a NULL op or seq raises instead of acting as a silent delete") {
    // the r14-review bug: a NULL-op winner was anti-joined out of base
    // and then filtered out of `applied` — the key vanished as if
    // deleted, with no error
    val nullOp = Seq((2L, null.asInstanceOf[String], 9L, "zz"))
      .toDF("k", "op", "seq", "v")
    val e1 = intercept[Exception] {
      Cdc.applyChangeLog(base, nullOp, Seq("k"), "seq", "op").collect()
    }
    assert(e1.getMessage.contains("NULL in op column"), e1.getMessage)
    val nullSeq = Seq((2L, "U", null.asInstanceOf[java.lang.Long], "zz"))
      .toDF("k", "op", "seq", "v")
    val e2 = intercept[Exception] {
      Cdc.applyChangeLog(base, nullSeq, Seq("k"), "seq", "op").collect()
    }
    assert(e2.getMessage.contains("NULL in seq column"), e2.getMessage)
  }
}
