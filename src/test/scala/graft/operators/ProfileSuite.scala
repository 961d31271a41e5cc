package graft.operators

import graft.SparkSpec

class ProfileSuite extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(2.5), Some("b")),
    (2L, None, Some("a")),
    (3L, Some(4.0), None),
    (4L, Some(2.5), Some("c"))
  ).toDF("id", "x", "s")

  test("profiles counts, distincts, and typed min/max per column") {
    val p = Profile.profile(df, Seq("id", "x", "s")).collect()
      .map(r => r.col_name -> r).toMap
    assert(p("id").n_nonnull === 4 && p("id").n_null === 0)
    assert(p("id").n_distinct === 4)
    assert(p("id").min_num === Some(1.0) && p("id").max_num === Some(4.0))
    assert(p("id").min_str.isEmpty && p("id").max_str.isEmpty)
    assert(p("x").n_nonnull === 3 && p("x").n_null === 1)
    assert(p("x").n_distinct === 2) // 2.5 appears twice
    assert(p("x").min_num === Some(2.5) && p("x").max_num === Some(4.0))
    assert(p("s").n_null === 1 && p("s").n_distinct === 3)
    assert(p("s").min_str === Some("a") && p("s").max_str === Some("c"))
    assert(p("s").min_num.isEmpty)
  }

  test("approx mode stays within HLL error on distinct counts") {
    val many = spark.range(10000).toDF("id")
    val exact = Profile.profile(many, Seq("id")).head().n_distinct
    val approx = Profile.profile(many, Seq("id"), exactDistinct = false)
      .head().n_distinct
    assert(exact === 10000L)
    assert(math.abs(approx - 10000L) < 600) // default rsd ~5%
  }

  test("unknown columns fail loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("not in schema"))
  }
}
