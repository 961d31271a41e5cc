package graft.core

import org.apache.spark.sql.{DataFrame, functions => F}

/** Two-sample fusion: rename ids to `id`, full-outer join with `_A`/`_B`
  * suffix disambiguation — the entry stage of both estimators
  * (`RegDI2.R:45-72`, `PC.R:88-116`).
  *
  * Suffix semantics follow dplyr's `full_join(..., suffix=c("_A","_B"))`:
  * only columns present in BOTH inputs are suffixed; unique columns keep
  * their names. `resolveA`/`resolveB` give the post-join name of an input
  * column (fixing the reference's documented cell-10 bug where a y_A
  * column also present in data_B was looked up unsuffixed —
  * `Simulaciones_Clean.ipynb:741,753`; we resolve side-aware instead).
  *
  * Scale: the join shuffles both sides by `id` (sort-merge). When one side
  * is small (the probability sample A is ~1-2k rows in the reference
  * workloads), pass `broadcastA = true` to broadcast-hash it instead —
  * at 100 TB the B side then never shuffles at all.
  */
final case class Fusion(
    df: DataFrame,
    fromA: Map[String, String],
    fromB: Map[String, String]
) {
  def resolveA(c: String): String = fromA.getOrElse(c,
    throw new IllegalArgumentException(s"column '$c' not from data_A"))
  def resolveB(c: String): String = fromB.getOrElse(c,
    throw new IllegalArgumentException(s"column '$c' not from data_B"))
}

object Fusion {

  def fuse(
      dataA: DataFrame,
      dataB: DataFrame,
      idVarA: String,
      idVarB: String,
      broadcastA: Boolean = true
  ): Fusion = {
    require(dataA.columns.contains(idVarA), s"'$idVarA' not in data_A")
    require(dataB.columns.contains(idVarB), s"'$idVarB' not in data_B")
    val a = dataA.withColumnRenamed(idVarA, "id")
    val b = dataB.withColumnRenamed(idVarB, "id")
    val aCols = a.columns.toSet
    val bCols = b.columns.toSet
    val shared = (aCols & bCols) - "id"
    val a2 = shared.foldLeft(a)((d, c) => d.withColumnRenamed(c, c + "_A"))
    val b2 = shared.foldLeft(b)((d, c) => d.withColumnRenamed(c, c + "_B"))
    val left = if (broadcastA) F.broadcast(a2) else a2
    val joined = left.join(b2, Seq("id"), "full_outer")
    val mapA = (aCols - "id").map(c =>
      c -> (if (shared(c)) c + "_A" else c)).toMap + (idVarA -> "id")
    val mapB = (bCols - "id").map(c =>
      c -> (if (shared(c)) c + "_B" else c)).toMap + (idVarB -> "id")
    Fusion(joined, mapA, mapB)
  }
}
