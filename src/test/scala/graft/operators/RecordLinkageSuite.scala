package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import RecordLinkage.{scorePairs, FieldComparison}

class RecordLinkageSuite extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, "ann", 10, 100.0),
    (2L, "bob", 10, 500.0),
    (3L, "cat", 20, 300.0)
  ).toDF("id", "name", "blk", "bal")

  private lazy val right = Seq(
    (11L, "ann", 10, 120.0), // same name+bal as l1 → strong match
    (12L, "zed", 10, 510.0), // bal close to l2, name differs
    (13L, "cat", 30, 300.0)  // would match l3 but different block
  ).toDF("id", "name", "blk", "bal")

  private val comparisons = Seq(
    FieldComparison("name", (a, b) => a === b, 4.0, -2.0),
    FieldComparison("bal", (a, b) => abs(a - b) < 50.0, 1.5, -0.5))

  test("agreement vector and fixed-order score per blocked pair") {
    val all = scorePairs(left, right, "id", Seq("blk"), comparisons)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // blocking: only blk=10 pairs exist (2 left × 2 right)
    assert(all.keySet === Set((1L, 11L), (1L, 12L), (2L, 11L), (2L, 12L)))
    val strong = all((1L, 11L))
    assert(strong.getInt(2) === 1 && strong.getInt(3) === 1)
    assert(strong.getDouble(4) === 5.5)
    val balOnly = all((2L, 12L))
    assert(balOnly.getInt(2) === 0 && balOnly.getInt(3) === 1)
    assert(balOnly.getDouble(4) === -0.5)
  }

  test("a NULL blocking key raises instead of silently dropping the " +
      "record from every candidate pair") {
    val l2 = Seq((1L, "ann", Option(10), 100.0),
      (2L, "bob", None: Option[Int], 500.0)).toDF("id", "name", "blk", "bal")
    val e = intercept[Exception] {
      scorePairs(l2, right, "id", Seq("blk"), comparisons).collect()
    }
    assert(e.getMessage.contains("NULL in blocking column"), e.getMessage)
  }

  test("minScore prunes in-plan") {
    val kept = scorePairs(left, right, "id", Seq("blk"), comparisons,
      minScore = 5.0).collect()
    assert(kept.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 11L)))
  }

  test("empty block keys or comparisons fail loudly") {
    assert(intercept[IllegalArgumentException] {
      scorePairs(left, right, "id", Seq.empty, comparisons)
    }.getMessage.contains("block key"))
    assert(intercept[IllegalArgumentException] {
      scorePairs(left, right, "id", Seq("blk"), Seq.empty)
    }.getMessage.contains("field comparisons"))
  }

  test("a NULL field comparison contributes weight 0 and agr NULL (the " +
      "Fellegi-Sunter missing-comparison convention)") {
    // the r14-review inconsistency: score penalized a NULL comparison
    // as a confirmed disagreement while agr_<field> reported NULL
    val l = Seq((1L, Option("ann"), 10, Option(100.0)),
      (2L, Option("bob"), 10, None: Option[Double]))
      .toDF("id", "name", "blk", "bal")
    val r = Seq((11L, Option("ann"), 10, None: Option[Double]),
      (12L, Option("bob"), 10, Option(500.0)))
      .toDF("id", "name", "blk", "bal")
    val out = scorePairs(l, r, "id", Seq("blk"), comparisons)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (Option(x.get(3)).map(_.asInstanceOf[Int]), x.getDouble(4))).toMap
    // (1, 11): name agrees (+4.0), bal NULL on the right → agr NULL, +0
    assert(out((1L, 11L)) === ((None, 4.0)))
    // (2, 12): name agrees (+4.0), bal NULL on the left → agr NULL, +0
    assert(out((2L, 12L)) === ((None, 4.0)))
    // (1, 12): name disagrees (-2.0), bal 100 vs 500 disagrees (-0.5)
    assert(out((1L, 12L)) === ((Some(0), -2.5)))
  }
}
