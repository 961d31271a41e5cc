package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / product analytics over an event log `(user, ts,
  * event_type, ...)`: ordered funnel conversion and cohort retention.
  * These are the workhorse queries of every event-analytics engine;
  * here they double as a stress test of the "one shuffle, many window
  * passes" plan shape.
  *
  * Scale shape (both operators): ONE hash exchange on the user key.
  * Every per-user quantity (stage timestamps, first-event cohort) is an
  * unordered `min(...) over (partition by user)` — no `orderBy` in the
  * window spec, so no sort, and consecutive windows over the same
  * partitioning reuse a single exchange (BehaviorSuite pins exactly
  * one user-keyed Exchange in the funnel plan). The final roll-up aggregates a
  * handful of rows per (stage) / (cohort, offset) — partial-aggregable,
  * so the second shuffle moves only group states. No joins, no
  * collects; a 100 TB event log costs one user-keyed shuffle.
  */
object Behavior {

  /** Per-user ORDERED funnel timestamps: stage k's timestamp is the
    * earliest event of type `stages(k)` that happens STRICTLY AFTER the
    * user's stage k−1 timestamp (the classic "view → click → purchase,
    * in that order" semantics — a purchase before the first view does
    * not convert). Emits one row per user with nullable
    * `t_<stage>` columns; a NULL at stage k means the user fell out of
    * the funnel there (and all later stages are NULL by construction).
    *
    * Each stage is one more no-sort window pass over the SAME user
    * partitioning; k stages = k Window nodes, still one exchange.
    */
  /** `col()` on a generated `t_<stage>` name, backtick-quoted: a stage
    * name with a dot (`cart.add` — common in real event taxonomies)
    * would otherwise parse as a nested-field access and fail to
    * resolve. withColumn/as take names literally; only reads parse. */
  private def tcol(stage: String): Column =
    col("`t_" + stage.replace("`", "``") + "`")

  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct: $stages")
    val w = Window.partitionBy(col(userCol))
    val withStages = stages.zipWithIndex.foldLeft(events) {
      case (df, (stage, 0)) =>
        df.withColumn(s"t_$stage",
          min(when(col(typeCol) === lit(stage), col(tsCol))).over(w))
      case (df, (stage, i)) =>
        val prev = tcol(stages(i - 1))
        df.withColumn(s"t_$stage",
          min(when(col(typeCol) === lit(stage) && col(tsCol) > prev,
            col(tsCol))).over(w))
    }
    // one row per user: the stage columns are per-user constants, so
    // min() == the value; this groupBy rides the same user exchange
    withStages.groupBy(col(userCol))
      .agg(min(tcol(stages.head)).as(s"t_${stages.head}"),
        stages.tail.map(s => min(tcol(s)).as(s"t_$s")): _*)
  }

  /** Funnel conversion counts: for each stage, how many users reached
    * it (with the ordered semantics of [[funnelTimes]]). Output
    * `(stage_idx, stage, n_users)` — n_users is non-increasing in
    * stage_idx by construction. */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    val times = funnelTimes(events, userCol, tsCol, typeCol, stages)
    // ONE global aggregation producing all stage counts in a single row
    // (a per-stage `times.agg(...)` would recompute the whole funnel k
    // times), then an explode-of-structs pivots the row to
    // (stage_idx, stage, n) — driver-free, still one pass, and fully
    // TYPED (stage names are lit() values, never spliced into SQL text)
    val one = times.agg(
      count(tcol(stages.head)).as("n_1"),
      stages.tail.zipWithIndex.map { case (s, i) =>
        count(tcol(s)).as(s"n_${i + 2}")
      }: _*)
    val cells = stages.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("stage_idx"), lit(s).as("stage"),
        col(s"n_${i + 1}").as("n_users"))
    }
    one.select(explode(array(cells: _*)).as("__st")).select(col("__st.*"))
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-truncated) of
    * the user's FIRST event of any type; a user is retained at offset k
    * if they have any event whose day falls k whole weeks (integer
    * `div 7` of the day difference) after their cohort day. Output
    * `(cohort_week, week_offset, n_users)` with distinct-user counts —
    * offset 0 rows count the cohort's size.
    *
    * The first-event timestamp is a no-sort window min over the user
    * partitioning (one exchange); the distinct-count roll-up groups on
    * (cohort, offset, user) first — partial-aggregable — then counts
    * rows per (cohort, offset). */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    // a NULL ts row would skip the window min (its user's cohort stays
    // correct) but emit a (cohort_week, week_offset = NULL, user) cell
    // that survives the distinct and counts as a real retention row —
    // plausible-shaped garbage. Raise with the column named instead
    // (the watermarkLateAccounting contract; r15 review).
    val tsG = when(col(tsCol).isNull, raise_error(lit(
      s"retentionCohorts: NULL in time column '$tsCol'")))
      .otherwise(col(tsCol))
    val firstTs = min(tsG).over(w)
    events
      .withColumn("__cohort_day", to_date(firstTs))
      // typed floor-division (no SQL splice of tsCol): datediff >= 0
      // here (ts >= the user's min ts), where floor(k/7.0) == k div 7
      // exactly — the division is correctly rounded and the true
      // quotient is never within an ulp of the next integer
      .withColumn("__offset",
        floor(datediff(to_date(col(tsCol)), col("__cohort_day"))
          / lit(7.0)))
      .select(date_trunc("week", col("__cohort_day"))
          .cast("date").as("cohort_week"),
        col("__offset").as("week_offset"), col(userCol))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Conversion attribution: for every conversion event, credit the
    * first-touch and last-touch occurrence of a touch event type that
    * STRICTLY precedes it in the user's timeline (classic marketing
    * attribution; NULLs when the user converted with no prior touch).
    *
    * Scale shape: one user-keyed exchange carries both running
    * window extremes (min for first touch, max for last) — no join, no
    * per-conversion re-scan; conversions project off the same pass.
    * Ordering compares integer microseconds with an id tie-break. */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String,
                       touchType: String, convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touchTs = when(col(typeCol) === touchType, unix_micros(col(tsCol)))
    events
      .withColumn("__first_touch", min(touchTs).over(w))
      .withColumn("__last_touch", max(touchTs).over(w))
      .filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("conversion_id"),
        unix_micros(col(tsCol)).as("conv_us"),
        col("__first_touch").as("first_touch_us"),
        col("__last_touch").as("last_touch_us"))
  }

  /** Daily growth curve: per event day, the distinct active users, the
    * users whose FIRST event lands that day, and the cumulative user
    * count — the standard product growth frame.
    *
    * Scale shape: first-event days come from one user-keyed aggregation
    * (partial-aggregable min); active counts from one (day, user)
    * distinct pass. Only the DAYS frame (calendar-bounded) sees the
    * running-sum window — never the events. All-integer outputs. */
  def userGrowth(events: DataFrame, userCol: String,
                 tsCol: String): DataFrame = {
    val firstDays = events.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("first_day"))
    val newU = firstDays.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val active = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count_distinct(col(userCol)).as("n_active"))
    val cum = Window.partitionBy(lit(1)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    active.join(newU, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_users", sum(col("n_new")).over(cum))
  }

  /** First-order Markov transition matrix of user journeys: counts (and
    * row-normalized probabilities) of each event type followed
    * immediately by each other event type within a user's timeline —
    * the path-analysis / next-step model behind "where do users go
    * after X".
    *
    * Scale shape: ONE user-keyed exchange carries the lag window (ties
    * broken on `idCol` for determinism); the (from, to) aggregation is
    * partial-aggregable and its key space is |types|² — tiny. The
    * probability divide runs over that tiny matrix, not the events.
    * Ordering compares integer microseconds (engine-exact), never a
    * seconds-truncated cast. */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val mat = events
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_evt"), col("__next").as("to_evt"))
      .agg(count(lit(1)).as("n"))
    val fromTotal = sum(col("n"))
      .over(Window.partitionBy(col("from_evt")))
    mat.select(col("from_evt"), col("to_evt"), col("n"),
      (col("n").cast("double") / fromTotal.cast("double")).as("p"))
  }
}
