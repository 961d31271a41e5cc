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
  * Scale: a naive `full_outer` join always sort-merges — Spark's
  * broadcast-hash join cannot preserve both sides, so a `broadcast()`
  * hint on a full-outer is silently IGNORED and the big B side gets
  * shuffled. With `broadcastA = true` (A small, ~1-2k rows in the
  * reference workloads) the fusion instead decomposes into two
  * broadcast-able pieces, neither of which shuffles B:
  *   part1 = B ⟕ broadcast(A)          (all B rows, A columns attached)
  *   part2 = A ∖ matched, B columns null, where
  *           matched = ids of (B ⋉ broadcast(A))   (≤ |A| rows)
  * — two B scans, zero exchanges, identical rows to `full_outer`
  * (verified against the sort-merge path in FusionSuite).
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
    // the id variable is canonicalized to "id" below; an input that
    // ALREADY carries a different column named "id" would end up with
    // two "id" columns after the rename and every Seq("id") join here
    // would die with an ambiguous-reference error that never names the
    // real cause (r15 review) — fail with the cause named instead
    require(idVarA == "id" || !dataA.columns.contains("id"),
      s"data_A already has a column named 'id' distinct from " +
        s"idVarA='$idVarA' — rename it before fusing")
    require(idVarB == "id" || !dataB.columns.contains("id"),
      s"data_B already has a column named 'id' distinct from " +
        s"idVarB='$idVarB' — rename it before fusing")
    val a = dataA.withColumnRenamed(idVarA, "id")
    val b = dataB.withColumnRenamed(idVarB, "id")
    val aCols = a.columns.toSet
    val bCols = b.columns.toSet
    val shared = (aCols & bCols) - "id"
    val a2 = shared.foldLeft(a)((d, c) => d.withColumnRenamed(c, c + "_A"))
    val b2 = shared.foldLeft(b)((d, c) => d.withColumnRenamed(c, c + "_B"))
    val joined =
      if (!broadcastA) a2.join(b2, Seq("id"), "full_outer")
      else {
        val part1 = b2.join(F.broadcast(a2), Seq("id"), "left_outer")
        val matched = b2.select("id").join(F.broadcast(a2.select("id")),
          Seq("id"), "left_semi").distinct()
        val aOnly = a2.join(F.broadcast(matched), Seq("id"), "left_anti")
        val part2 = b2.columns.filter(_ != "id").foldLeft(aOnly) {
          (d, c) => d.withColumn(c, F.lit(null).cast(b2.schema(c).dataType))
        }
        part1.unionByName(part2.select(part1.columns.map(F.col): _*))
      }
    val mapA = (aCols - "id").map(c =>
      c -> (if (shared(c)) c + "_A" else c)).toMap + (idVarA -> "id")
    val mapB = (bCols - "id").map(c =>
      c -> (if (shared(c)) c + "_B" else c)).toMap + (idVarB -> "id")
    Fusion(joined, mapA, mapB)
  }
}
