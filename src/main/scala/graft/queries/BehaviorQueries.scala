package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Behavior
import graft.util.Tables.loadEvents

/** Behavioral / product-analytics queries over the `events` table:
  * ordered funnel conversion (a22) and weekly cohort retention (a23).
  * Both are pure integer/timestamp arithmetic end to end — min-over-
  * partition, integer day `div` 7, distinct counts — so they hash-match
  * the DuckDB oracles exactly. Plan shape notes live on
  * [[graft.operators.Behavior]]; BehaviorSuite pins the single
  * user-keyed exchange under the funnel's window stack.
  */
object BehaviorQueries {

  val qs: Seq[Q] = Seq(

    // ---- A22 ordered funnel: view → click → purchase ------------------
    // Stage k counts users whose earliest stage-k event falls STRICTLY
    // after their stage-(k-1) time; a purchase that precedes the first
    // view does not convert. The oracle chains the same window mins
    // (NULL propagation drops fallen-out users in both engines).
    Q("a22_funnel",
      (s, d) => Behavior.funnelCounts(loadEvents(s, d), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("stage_idx"),
      Some("""WITH s1 AS (SELECT user_id, ts, event_type,
                       min(CASE WHEN event_type = 'view' THEN ts END)
                         OVER (PARTITION BY user_id) AS t_view
                     FROM events),
                   s2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                                              AND ts > t_view THEN ts END)
                       OVER (PARTITION BY user_id) AS t_click FROM s1),
                   s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                              AND ts > t_click THEN ts END)
                       OVER (PARTITION BY user_id) AS t_purchase FROM s2),
                   u AS (SELECT user_id, min(t_view) AS t_view,
                                min(t_click) AS t_click,
                                min(t_purchase) AS t_purchase
                         FROM s3 GROUP BY user_id)
              SELECT * FROM (
                SELECT 1 AS stage_idx, 'view' AS stage,
                       count(t_view) AS n_users FROM u
                UNION ALL SELECT 2, 'click', count(t_click) FROM u
                UNION ALL SELECT 3, 'purchase', count(t_purchase) FROM u)
              ORDER BY stage_idx""")),

    // ---- A23 weekly cohort retention ----------------------------------
    // Cohort = ISO week of the user's first event; retained at offset k
    // if any event lands k whole weeks (integer day-diff div 7) after
    // the cohort day. Offset-0 rows are cohort sizes.
    Q("a23_retention",
      (s, d) => Behavior.retentionCohorts(loadEvents(s, d), "user_id", "ts")
        .orderBy("cohort_week", "week_offset"),
      Some("""WITH f AS (SELECT user_id, ts,
                       CAST(min(ts) OVER (PARTITION BY user_id) AS DATE)
                         AS cohort_day
                     FROM events),
                   d AS (SELECT DISTINCT
                           CAST(date_trunc('week', cohort_day) AS DATE)
                             AS cohort_week,
                           date_diff('day', cohort_day, CAST(ts AS DATE)) // 7
                             AS week_offset,
                           user_id
                         FROM f)
              SELECT cohort_week, week_offset, count(*) AS n_users
              FROM d GROUP BY cohort_week, week_offset
              ORDER BY cohort_week, week_offset""")),

    // ---- W9 stateful streaming funnel (graded batch rendition) --------
    // The flatMapGroupsWithState funnel kernel (Streams.funnelProgress)
    // run in BATCH mode — the same code path the streaming query uses,
    // state just never persists — graded against the window-based SQL
    // funnel. StreamingSuite covers the cross-micro-batch state carry.
    Q("w09_stream_funnel",
      (s, d) => {
        import s.implicits._
        val ev = loadEvents(s, d)
          .select(col("user_id"), col("ts"), col("event_type"))
          .as[graft.streaming.FunnelEvent]
        graft.streaming.Streams
          .funnelProgress(ev, Seq("view", "click", "purchase"))
          .toDF()
          .select(col("user_id"),
            timestamp_micros(element_at(col("times"), 1))
              .cast("string").as("t_view"),
            timestamp_micros(element_at(col("times"), 2))
              .cast("string").as("t_click"),
            timestamp_micros(element_at(col("times"), 3))
              .cast("string").as("t_purchase"))
          .orderBy("user_id")
      },
      Some("""WITH s1 AS (SELECT user_id, ts, event_type,
                       min(CASE WHEN event_type = 'view' THEN ts END)
                         OVER (PARTITION BY user_id) AS t_view
                     FROM events),
                   s2 AS (SELECT *, min(CASE WHEN event_type = 'click'
                                              AND ts > t_view THEN ts END)
                       OVER (PARTITION BY user_id) AS t_click FROM s1),
                   s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase'
                                              AND ts > t_click THEN ts END)
                       OVER (PARTITION BY user_id) AS t_purchase FROM s2)
              SELECT user_id, CAST(min(t_view) AS VARCHAR) AS t_view,
                     CAST(min(t_click) AS VARCHAR) AS t_click,
                     CAST(min(t_purchase) AS VARCHAR) AS t_purchase
              FROM s3 GROUP BY user_id ORDER BY user_id""")),

    // ---- A30 first-order Markov transition matrix ---------------------
    // Counts + row-normalized probabilities of event_type → next
    // event_type per user timeline (Behavior.transitionCounts). One
    // user-keyed exchange for the lag; the matrix itself is |types|².
    // Integer counts + one IEEE divide per cell → full hash oracle.
    // Both engines order by integer microseconds with event_id ties.
    Q("a30_transitions",
      (s, d) => Behavior.transitionCounts(loadEvents(s, d),
          "user_id", "ts", "event_type", "event_id")
        .orderBy("from_evt", "to_evt"),
      Some("""WITH s AS (SELECT event_type AS from_evt,
                           lead(event_type) OVER
                             (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id) AS to_evt
                         FROM events),
                   c AS (SELECT from_evt, to_evt, count(*) AS n
                         FROM s WHERE to_evt IS NOT NULL GROUP BY 1, 2)
              SELECT from_evt, to_evt, n,
                     CAST(n AS DOUBLE) /
                       CAST(sum(n) OVER (PARTITION BY from_evt) AS DOUBLE) AS p
              FROM c ORDER BY from_evt, to_evt""")),

    // ---- A33 first/last-touch conversion attribution ------------------
    // Each purchase credits the first and last strictly-preceding view
    // in the user's timeline (Behavior.touchAttribution): both running
    // extremes ride ONE user-keyed window pass, all-integer microsecond
    // outputs → full hash oracle.
    Q("a33_attribution",
      (s, d) => Behavior.touchAttribution(loadEvents(s, d),
          "user_id", "ts", "event_type", "event_id",
          touchType = "view", convType = "purchase")
        .orderBy("user_id", "conversion_id"),
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
                                epoch_us(ts) AS us FROM events),
                   w AS (SELECT user_id, event_id, event_type, us,
                           min(CASE WHEN event_type = 'view' THEN us END)
                             OVER pre AS ft,
                           max(CASE WHEN event_type = 'view' THEN us END)
                             OVER pre AS lt
                         FROM e
                         WINDOW pre AS (PARTITION BY user_id
                           ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING))
              SELECT user_id, event_id AS conversion_id, us AS conv_us,
                     ft AS first_touch_us, lt AS last_touch_us
              FROM w WHERE event_type = 'purchase'
              ORDER BY user_id, conversion_id""")),

    // ---- A34 daily growth curve (new / active / cumulative users) -----
    // Behavior.userGrowth: first-event days from one user-keyed min,
    // actives from one distinct pass, running sum only over the
    // calendar-bounded days frame. All-integer → full hash oracle.
    Q("a34_user_growth",
      (s, d) => Behavior.userGrowth(loadEvents(s, d), "user_id", "ts")
        .orderBy("day"),
      Some("""WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS first_day
                         FROM events GROUP BY user_id),
                   n AS (SELECT first_day AS day, count(*) AS n_new
                         FROM f GROUP BY 1),
                   a AS (SELECT CAST(ts AS DATE) AS day,
                                count(DISTINCT user_id) AS n_active
                         FROM events GROUP BY 1)
              SELECT a.day, a.n_active, COALESCE(n.n_new, 0) AS n_new,
                     CAST(sum(COALESCE(n.n_new, 0)) OVER
                       (ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS BIGINT) AS cum_users
              FROM a LEFT JOIN n ON n.day = a.day
              ORDER BY a.day"""))
  )
}
