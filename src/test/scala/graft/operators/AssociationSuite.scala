package graft.operators

import graft.SparkSpec

class AssociationSuite extends SparkSpec {
  import spark.implicits._

  // baskets: {x,y}, {x,y}, {x,z}, {y} — plus an in-basket duplicate of x
  private lazy val baskets = Seq(
    (1L, "x"), (1L, "y"), (1L, "x"),
    (2L, "x"), (2L, "y"),
    (3L, "x"), (3L, "z"),
    (4L, "y")
  ).toDF("b", "i")

  test("support, confidence, and lift match hand computation") {
    val out = Association.rules(baskets, "b", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val xy = out(("x", "y"))
    // x in 3 baskets, y in 3, {x,y} in 2 of 4 baskets
    assert(xy.getLong(2) === 2 && xy.getLong(3) === 3 && xy.getLong(4) === 3)
    assert(xy.getLong(5) === 4)
    assert(xy.getDouble(6) === 2.0 / 3.0) // conf x→y
    assert(xy.getDouble(7) === 2.0 / 3.0) // conf y→x
    assert(xy.getDouble(8) === 8.0 / 9.0) // lift = 2·4/(3·3)
    val xz = out(("x", "z"))
    assert(xz.getLong(2) === 1 && xz.getDouble(8) === 4.0 / 3.0)
    assert(!out.contains(("y", "z"))) // never co-occur
  }

  test("minPairCount prunes and maxBasketSize drops oversized baskets") {
    val pruned = Association.rules(baskets, "b", "i", minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pruned === Set(("x", "y")))
    // basket 1 has 2 distinct items; cap at 1 removes all of its pairs
    val capped = Association.rules(baskets, "b", "i",
      maxBasketSize = Some(1)).collect()
    // only basket 4 (y) survives the cap among... baskets 1-3 all have 2
    assert(capped.isEmpty)
  }
  test("NULL basket ids or items raise instead of silently deflating " +
      "confidence/lift denominators") {
    val nullBasket = Seq((Option(1L), Option("x")),
      (None: Option[Long], Option("y"))).toDF("b", "i")
    val e1 = intercept[Exception] {
      Association.rules(nullBasket, "b", "i").collect()
    }
    assert(e1.getMessage.contains("NULL in basket column"), e1.getMessage)
    val nullItem = Seq((Option(1L), Option("x")),
      (Option(1L), None: Option[String])).toDF("b", "i")
    val e2 = intercept[Exception] {
      Association.rules(nullItem, "b", "i").collect()
    }
    assert(e2.getMessage.contains("NULL in item column"), e2.getMessage)
  }

}
