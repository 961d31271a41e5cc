package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Per-column data profiling — the "what is in this table" first pass of
  * any ingestion pipeline: non-null / null / exact-distinct counts plus
  * typed min/max per column, one row per profiled column.
  *
  * Scale design (100 TB): everything is computed in ONE aggregation job.
  * Plain counts and min/max are partial-aggregable; the exact distinct
  * counts make Spark plan an Expand (one replica of the scan's rows per
  * distinct aggregate) feeding a two-level hash aggregate — map-side
  * partial distinct keeps the shuffle bounded by the distinct-value
  * count, not the row count. For quick looks at petabyte tables where
  * exactness is not required, pass `exactDistinct = false` to swap in
  * HLL `approx_count_distinct` (single scan, no Expand, O(1) state).
  * The result is k rows of scalars — driver-sized by construction.
  */
object Profile {

  /** One profiled column. Numeric min/max land in `min_num`/`max_num`
    * (cast to double), everything orderable-but-not-numeric in
    * `min_str`/`max_str` — never a cross-engine double→string format. */
  final case class ColumnProfile(
      col_name: String,
      n_nonnull: Long,
      n_null: Long,
      n_distinct: Long,
      min_num: Option[Double],
      max_num: Option[Double],
      min_str: Option[String],
      max_str: Option[String])

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = true): Dataset[ColumnProfile] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(cols.nonEmpty, "no columns to profile")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in schema: ${missing.mkString(",")}")
    val isNum: Map[String, Boolean] =
      cols.map(c => c -> df.schema(c).dataType.isInstanceOf[NumericType]).toMap
    // backtick-quoted col refs: col(c) parses dots as struct-field
    // access, so a flat column literally named "a.b" would fail to
    // resolve (or silently read a struct field) — the iqrOutliers
    // quoting, applied here too so profile() is name-agnostic like the
    // comment there claims (r15 review). The `__nn`-style aliases are
    // safe as-is: Row.getAs looks names up verbatim, no parsing.
    def qc(c: String) = col("`" + c.replace("`", "``") + "`")
    val aggs = cols.flatMap { c =>
      val distinct =
        if (exactDistinct) count_distinct(qc(c))
        else approx_count_distinct(qc(c))
      Seq(
        count(qc(c)).as(s"${c}__nn"),
        count(when(qc(c).isNull, lit(1))).as(s"${c}__nul"),
        distinct.as(s"${c}__nd")) ++
        (if (isNum(c))
           Seq(min(qc(c)).cast("double").as(s"${c}__mn"),
               max(qc(c)).cast("double").as(s"${c}__mx"))
         else
           Seq(min(qc(c)).cast("string").as(s"${c}__mn"),
               max(qc(c)).cast("string").as(s"${c}__mx")))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt[T](name: String): Option[T] = {
      val i = row.fieldIndex(name)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    val profiles = cols.map { c =>
      ColumnProfile(
        col_name = c,
        n_nonnull = row.getAs[Long](s"${c}__nn"),
        n_null = row.getAs[Long](s"${c}__nul"),
        n_distinct = row.getAs[Long](s"${c}__nd"),
        min_num = if (isNum(c)) opt[Double](s"${c}__mn") else None,
        max_num = if (isNum(c)) opt[Double](s"${c}__mx") else None,
        min_str = if (isNum(c)) None else opt[String](s"${c}__mn"),
        max_str = if (isNum(c)) None else opt[String](s"${c}__mx"))
    }
    spark.createDataset(profiles)
  }

  /** Equal-width histogram of a numeric column over [lo, hi): bin
    * `⌊(v − lo)/width⌋` with an underflow bin −1 and overflow bin
    * `nBins` — one partial-aggregable pass, observed bins only. Width
    * and bin edges are fixed IEEE arithmetic, engine-portable. */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
                nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, s"bad histogram spec [$lo, $hi) x $nBins")
    val width = (hi - lo) / nBins
    val v = col(valueCol)
    // clamp the computed bin: when width isn't exactly representable,
    // floor((v-lo)/width) can reach nBins for a v still below hi
    val bin = when(v.isNull, lit(null).cast("long"))
      .when(v < lo, lit(-1L))
      .when(v >= hi, lit(nBins.toLong))
      .otherwise(least(lit(nBins - 1L),
        floor((v - lit(lo)) / lit(width)).cast("long")))
    df.select(bin.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo",
        when(col("bin") >= 0 && col("bin") < nBins,
          lit(lo) + col("bin").cast("double") * lit(width)))
  }

  /** One data-quality expectation: either a per-row predicate that must
    * hold, or a column whose values must be unique. */
  sealed trait Expectation { def name: String }
  final case class RowExpectation(name: String,
      holds: org.apache.spark.sql.Column) extends Expectation
  final case class UniqueExpectation(name: String, column: String)
      extends Expectation

  /** Expectation report: one pass computes every rule's violation count
    * (a NULL predicate counts as a violation; uniqueness violations are
    * n − distinct). The per-rule `pass` flag makes the frame a CI gate:
    * `report.filter(col("pass") === 0).isEmpty`. */
  def expectations(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(rules.nonEmpty, "no expectations given")
    require(rules.map(_.name).distinct.size == rules.size,
      "duplicate expectation names")
    val aggs = count(lit(1)).as("__n") +: rules.map {
      case RowExpectation(n, holds) =>
        sum(when(coalesce(holds, lit(false)) === false, 1L).otherwise(0L))
          .as(s"__v_$n")
      case UniqueExpectation(n, c) =>
        (count(col(c)) - count_distinct(col(c))).as(s"__v_$n")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("__n")
    rules.map { r =>
      // sum() over zero rows is NULL — an empty frame has no violations
      val i = row.fieldIndex(s"__v_${r.name}")
      val v = if (row.isNullAt(i)) 0L else row.getLong(i)
      (r.name, n, v, if (v == 0L) 1 else 0)
    }.toDF("rule", "n_rows", "n_violations", "pass")
  }

  /** Cross-table referential-integrity check: child rows whose key has
    * no parent are orphans. One left-anti join (broadcast-ready parent
    * key set for dimension-sized parents; plain hash join otherwise) +
    * one count — the FK half [[expectations]]'s single-table rules
    * can't express. */
  def referentialCheck(child: DataFrame, parent: DataFrame,
                       childKey: String, parentKey: String): DataFrame = {
    val spark = child.sparkSession
    import spark.implicits._
    // ONE pass over the (large) child side: left join the distinct
    // parent keys with a hit marker and count rows + misses together.
    // A NULL child key is NOT an orphan (ANSI FK semantics: NULL means
    // "no parent", which is valid for an optional FK) — it can never
    // equi-join, so without the isNotNull term every NULL-key row
    // would flip `pass` to 0 on a perfectly valid table.
    val row = child
      .join(parent.select(col(parentKey).as(childKey))
        .distinct().withColumn("__hit", lit(1)),
        Seq(childKey), "left")
      .agg(count(lit(1)).as("n_child"),
        count(when(col("__hit").isNull && col(childKey).isNotNull, 1))
          .as("n_orphans"))
      .head()
    val (nChild, orphans) = (row.getLong(0), row.getLong(1))
    Seq((nChild, orphans, if (orphans == 0L) 1 else 0))
      .toDF("n_child", "n_orphans", "pass")
  }

  /** Tukey IQR outlier census per column: exact Q1/Q3 (the `percentile`
    * interpolation — a14's convention, which hash-matches DuckDB's
    * quantile_cont), the 1.5·IQR fences lo = Q1 − 1.5·(Q3 − Q1) /
    * hi = Q3 + 1.5·(Q3 − Q1) as mirrored IEEE ops, and the strict
    * outside counts. NULLs are ignored on both the quantile and the
    * count side (a NULL comparison is not an outlier), matching SQL
    * semantics.
    *
    * Scale shape: the quartiles come from
    * [[graft.operators.Ranks.percentileSelect]] — ALL columns in one
    * distributed selection pass with O(1) per-task state (exact
    * `percentile` buffered a value→count map merged on a single task,
    * O(distinct values) at one point of concentration — the last
    * unbounded-state aggregation in the timed catalog, r16 verdict);
    * then one counting pass over the data with the four fences per
    * column inlined as literals. The fences are the same IEEE double
    * ops as before, now computed driver-side on the same quartile
    * doubles — bit-identical, so the hash oracle stands. */
  def iqrOutliers(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "iqrOutliers: need at least one column")
    // identifiers are backtick-quoted — a column name with a space/dot/
    // reserved word would otherwise fail the SQL parse (profile()
    // handles the same column fine via typed col(); the quoting keeps
    // both entry points name-agnostic)
    def bq(c: String): String = "`" + c.replace("`", "``") + "`"
    // percentileSelect raises the same named error for an all-NULL
    // column that the percentile-NULL require used to
    val q = graft.operators.Ranks.percentileSelect(df, cols, Seq(0.25, 0.75))
    val fences = cols.map { c =>
      val (q1, q3) = (q((c, 0.25)), q((c, 0.75)))
      val iqr = q3 - q1
      (c, q1, q3, q1 - 1.5 * iqr, q3 + 1.5 * iqr)
    }
    val countAggs = fences.zipWithIndex.flatMap { case ((c, _, _, lo, hi), i) => Seq(
      sum(when(col(bq(c)) < lit(lo), 1L).otherwise(0L)).as(s"nb_$i"),
      sum(when(col(bq(c)) > lit(hi), 1L).otherwise(0L)).as(s"na_$i"))
    }
    val row = df.agg(countAggs.head, countAggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    fences.zipWithIndex.map { case ((c, q1, q3, lo, hi), i) =>
      (c, q1, q3, lo, hi,
        row.getAs[Long](s"nb_$i"), row.getAs[Long](s"na_$i"))
    }.sortBy(_._1)
      .toDF("colname", "q1", "q3", "lo_fence", "hi_fence",
        "n_below", "n_above")
  }
}
