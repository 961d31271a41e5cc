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
}
