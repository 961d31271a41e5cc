package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.estimators.{RegDI, RegDIConfig, PC, PCConfig}
import graft.synth.Population

/** Scale probe: the full estimator pipeline on populations 10-100× the
  * reference's N=100k, all distributed (spark.range synthesis → fusion →
  * calibration → estimate; no task-local shortcuts). Run:
  *   sbt "runMain graft.tools.ScaleProbe [nPop]"
  * Prints wall time and the estimates (true mean 3.0).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nPop = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t0 = System.nanoTime()
    val pop = Population.cell2(spark, nPop, seed = 7L)
      .withColumn("in_A", (pmod(hash(col("id")), lit(nPop / 2000L)) === 0).cast("int"))
      .withColumn("in_B",
        (rand(99L) < lit(0.7) - lit(0.4) * (col("y_i") > 3.0).cast("double"))
          .cast("int"))
      .cache()
    val n = pop.count()
    val tGen = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val regdi = RegDI.oneTable(pop, "in_A", "in_B",
      RegDIConfig(yACol = "y_i", yBCol = "y_i", auxVars = Seq("x_i"),
        correction = 1))
    val tRegdi = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val pc = PC.oneTable(pop, "in_A", "in_B",
      PCConfig(yACol = Some("y_i"), yBCol = Some("y_i"),
        auxVars = Seq("x1_i"), scenario = 1))
    val tPc = (System.nanoTime() - t2) / 1e9

    println(f"N=$n%,d  gen+cache=$tGen%.1fs  " +
      f"RegDI corr1: ${regdi.mean}%.4f (se ${regdi.se}%.4f) in $tRegdi%.1fs  " +
      f"PC scen1: ${pc.estimator}%.4f in $tPc%.1fs")
    pop.unpersist()
    spark.stop()
  }
}
