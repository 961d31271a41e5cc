package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FormulaSuite extends AnyFunSuite {
  test("parses response + terms + intercept") {
    val f = FormulaSpec.parse("y_i ~ x1 + x2")
    assert(f.response.contains("y_i"))
    assert(f.terms == Seq("x1", "x2"))
    assert(f.intercept)
    assert(f.allVars == Seq("y_i", "x1", "x2"))
  }

  test("no-intercept ~0 + ... calibration formula (RegDI2.R:177)") {
    val f = FormulaSpec.parse("~0 + uno + delta_i + delta_yi")
    assert(f.response.isEmpty)
    assert(!f.intercept)
    assert(f.terms == Seq("uno", "delta_i", "delta_yi"))
  }

  test("-1 also removes the intercept") {
    assert(!FormulaSpec.parse("y ~ -1 + x").intercept)
  }

  test("rejects non-formulas") {
    assertThrows[IllegalArgumentException](FormulaSpec.parse("not a formula"))
  }
}

class ColumnResolverSuite extends AnyFunSuite {
  private val cols = Set("id", "y_i_A", "y_i_B", "x_i_B", "z_i")

  test("prefers _A over _B over bare (PC.R:20-34)") {
    assert(ColumnResolver.resolveTerm("y_i", cols) == "y_i_A")
    assert(ColumnResolver.resolveTerm("x_i", cols) == "x_i_B")
    assert(ColumnResolver.resolveTerm("z_i", cols) == "z_i")
  }

  test("errors on unknown variable") {
    assertThrows[IllegalArgumentException](
      ColumnResolver.resolveTerm("missing", cols))
  }
}

class FusionSuite extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("suffixes only shared columns; indicators from null-ness") {
    import spark.implicits._
    val a = Seq((1L, 10.0, "a"), (2L, 20.0, "b"))
      .toDF("ida", "y", "only_a")
    val b = Seq((2L, 21.0, 5.0), (3L, 31.0, 6.0))
      .toDF("idb", "y", "only_b")
    val f = Fusion.fuse(a, b, "ida", "idb")
    assert(f.df.columns.toSet ==
      Set("id", "y_A", "only_a", "y_B", "only_b"))
    assert(f.resolveA("y") == "y_A")
    assert(f.resolveB("y") == "y_B")
    assert(f.resolveA("only_a") == "only_a")
    val rows = f.df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Any]("y_B") == null) // id=1 only in A
    assert(rows(2).getAs[Any]("y_A") == null) // id=3 only in B
  }

  test("broadcast decomposition ≡ sort-merge full_outer (incl. dup/null ids)") {
    import spark.implicits._
    val a = Seq((Some(1L), 10.0), (Some(2L), 20.0), (Some(2L), 21.0),
      (None: Option[Long], 99.0)).toDF("ida", "y")
    val b = Seq((Some(2L), 5.0), (Some(3L), 6.0), (Some(3L), 7.0),
      (None: Option[Long], 88.0)).toDF("idb", "z")
    def rows(bc: Boolean) =
      Fusion.fuse(a, b, "ida", "idb", broadcastA = bc).df
        .select("id", "y", "z").collect()
        .map(r => (r.getAs[Any](0), r.getAs[Any](1), r.getAs[Any](2)))
        .sortBy(t => (String.valueOf(t._1), String.valueOf(t._2),
          String.valueOf(t._3))).toSeq
    assert(rows(true) === rows(false))
  }

  test("broadcast fusion plan contains no SortMergeJoin") {
    import spark.implicits._
    val a = Seq((1L, 1.0)).toDF("ida", "y")
    val b = Seq((1L, 2.0)).toDF("idb", "z")
    val plan = Fusion.fuse(a, b, "ida", "idb").df
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("cell-10 regression: y_A name also present in data_B resolves side-aware") {
    import spark.implicits._
    // reference bug (ipynb:741,753): y_A_col='y_true' also exists in B;
    // R looked it up unsuffixed post-join and errored. We resolve to _A.
    val a = Seq((1L, 1.0)).toDF("id_a", "y_true")
    val b = Seq((1L, 2.0, 3.0)).toDF("id_b", "y_true", "y_obs")
    val f = Fusion.fuse(a, b, "id_a", "id_b")
    assert(f.resolveA("y_true") == "y_true_A")
    assert(f.resolveB("y_true") == "y_true_B")
    assert(f.resolveB("y_obs") == "y_obs")
  }
}
