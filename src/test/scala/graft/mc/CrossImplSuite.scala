package graft.mc

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.estimators.{PC, PCConfig, RegDI, RegDIConfig}

/** Cross-implementation consistency: the DISTRIBUTED estimators
  * (graft.estimators, Gram-aggregation + breeze solve over DataFrames)
  * and the TASK-LOCAL ones (graft.mc.LocalSim, primitive arrays +
  * Gaussian elimination) implement the same closed forms — on identical
  * data they must agree to solver precision. This pins the Monte-Carlo
  * harness to the production estimators. */
class CrossImplSuite extends SparkSpec {
  import spark.implicits._

  private val n = 4000
  // deterministic synthetic population (no RNG-parity concerns)
  private lazy val rng = new java.util.Random(99L)
  private lazy val x = Array.fill(n)(2.0 + rng.nextGaussian())
  private lazy val y = Array.tabulate(n)(i => 3.0 + 0.7 * (x(i) - 2.0) +
    rng.nextGaussian() * 0.7)
  private lazy val x1 = x.map(v => if (v <= 2.0) 1.0 else 0.0)
  private lazy val x2 = x.map(v => if (v > 2.0) 1.0 else 0.0)
  private lazy val inA = Array.tabulate(n)(i => i % 7 == 0)
  private lazy val inB = Array.tabulate(n)(i => y(i) < 3.2 && i % 2 == 0)

  private lazy val df = (0 until n).map(i =>
      (i.toLong, x(i), y(i), x1(i), x2(i),
        if (inA(i)) 1 else 0, if (inB(i)) 1 else 0))
    .toDF("id", "x_i", "y_i", "x1_i", "x2_i", "in_A", "in_B").cache()

  test("RegDI correction 1: distributed == task-local to 1e-9") {
    val dA = n.toDouble / inA.count(identity)
    val local = LocalSim.regdi2(n, y, y, Array(x1), inA, inB, dA)
    val dist = RegDI.oneTable(df, "in_A", "in_B",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", auxVars = Seq("x1_i"),
        correction = 1)).mean
    assert(math.abs(local - dist) < 1e-9, s"local $local vs dist $dist")
  }

  test("PC scenario 1 (direct totals): distributed == task-local to 1e-9") {
    val dA = n.toDouble / inA.count(identity)
    val dB = n.toDouble / inB.count(identity)
    val local = LocalSim.pc(n, y, Array(x1, x2), inA, inB, dA, dB)
    val dist = PC.oneTable(df, "in_A", "in_B",
      PCConfig(yACol = Some("y_i"), yBCol = Some("y_i"),
        auxVars = Seq("x1_i", "x2_i"), scenario = 1)).estimator
    assert(math.abs(local - dist) < 1e-9, s"local $local vs dist $dist")
  }
}
