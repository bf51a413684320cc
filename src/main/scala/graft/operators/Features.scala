package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time feature engineering over per-entity event streams — the
  * rolling/lag primitives a feature store computes before training
  * (trailing-window activity counts, inter-event gaps, previous-value
  * lags).
  */
object Features {

  /** Per-user rolling event-time features: trailing-window count/sum,
    * previous-event lag, and inter-event gap.
    *
    * All compared values are exact integers: `value` quantizes to cents
    * BEFORE any aggregation (the suite-wide `*_cents` discipline),
    * timestamps compare as epoch micros — so the result is engine- and
    * partitioning-independent and fully hash-gated (q_rolling_features).
    *
    * Two windows with DIFFERENT orderings, deliberately:
    *  - the RANGE frame orders by the timestamp alone — SQL RANGE frames
    *    include all peers of the current row, so tied timestamps get
    *    identical (deterministic) rolling values regardless of their
    *    physical order, in Spark and DuckDB alike;
    *  - the lag/gap ROWS window orders by (ts, event_id) — a total
    *    order, because `lag` over a tie-ambiguous ordering is
    *    partitioning-dependent (round-2's nondeterminism lesson).
    *
    * Scale: both windows partition by the user key — per-partition state
    * is one user's history, bounded by per-entity activity, the shape
    * every feature store assumes (a pathological single-entity firehose
    * needs the streaming path's watermarked state instead, or
    * pre-bucketing by time; a window cannot AQE-split). One shuffle on
    * the user key serves both windows — same partitioning, no second
    * exchange.
    */
  def rollingEventFeatures(
      events: DataFrame, windowSecs: Long = 3600L,
      userCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "value", idCol: String = "event_id"): DataFrame = {
    require(windowSecs > 0, "windowSecs must be positive")
    val staged = events.select(
      col(idCol), col(userCol),
      expr(s"unix_micros($tsCol)").as("__us"),
      expr(s"CAST(round($valCol * 100) AS BIGINT)").as("value_cents"))
    val wRange = Window.partitionBy(userCol).orderBy("__us")
      .rangeBetween(-windowSecs * 1000000L, 0L)
    val wRow = Window.partitionBy(userCol).orderBy("__us", idCol)
    staged.select(
      col(idCol), col(userCol), col("value_cents"),
      count(lit(1)).over(wRange).as("roll_n"),
      sum("value_cents").over(wRange).as("roll_cents"),
      lag("value_cents", 1).over(wRow).as("prev_cents"),
      (col("__us") - lag("__us", 1).over(wRow)).as("gap_us"))
  }

  /** Ordered funnel conversion: how many users performed stage 0, then
    * stage 1 STRICTLY after their first stage-0 event, then stage 2
    * strictly after that, … — the conversion report every event pipeline
    * ships (view → click → purchase).
    *
    * Semantics pinned for determinism: each stage matches the EARLIEST
    * qualifying event (min ts strictly after the previous stage's match),
    * so the per-user chain is unique regardless of partitioning — the
    * greedy-earliest chain also maximizes completion (matching any later
    * qualifying event can only lose completions), so `n_users` is the
    * true stage-completion count, and ties-at-the-same-instant do NOT
    * advance a funnel (strict >; an atomic view+click burst at one
    * timestamp counts as view only). Exact timestamp integers throughout
    * ⇒ fully hash-gated (q_funnel).
    *
    * Plan: per-stage filtered min-aggregation, each joined to the
    * previous stage's (user, ts) relation ON THE SAME user key — every
    * aggregation and join shares one partitioning (pinned: k stages plan
    * exactly k user-key exchanges under broadcast-off), and each stage's
    * relation SHRINKS (funnels only narrow). The stage counts union at
    * the end — k single-row aggregates, no corpus-side work.
    */
  def funnel(
      events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage required")
    require(stages.distinct == stages, "funnel stages must be distinct")
    // null users can't chain (a join key of NULL matches nothing), so
    // exclude them from stage 0 too — and filtering EXPLICITLY keeps the
    // count branches' subtrees canonically equal to the join branches'
    // (which inherit isnotnull(user) from the inner join), so reuse holds
    val perStage = stages.zipWithIndex.map { case (st, i) =>
      events.filter(col(typeCol) === st && col(userCol).isNotNull)
        .select(col(userCol), expr(s"unix_micros($tsCol)").as(s"__us$i"))
    }
    val chain = perStage.zipWithIndex.drop(1).scanLeft(
      perStage.head.groupBy(userCol).agg(min("__us0").as("__t"))) {
      case (prev, (df, i)) =>
        df.join(prev, Seq(userCol))
          .filter(col(s"__us$i") > col("__t"))
          .groupBy(userCol).agg(min(s"__us$i").as("__t"))
    }
    chain.zip(stages).zipWithIndex.map { case ((df, st), i) =>
      // count(__t), not count(*): a null-ts event can't anchor a funnel
      // (no ordering), so users whose only match is null-timed don't
      // count — and keeping __t in the count branch makes its subtree
      // CANONICALLY IDENTICAL to the one feeding the next stage, so the
      // union's per-stage branches collapse to ReusedExchange instead of
      // re-running the chain prefix (pinned in PlanShapeSpec)
      df.agg(count("__t").as("n_users"))
        .select(lit(i).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Weekly retention cohorts: users grouped by their first-activity
    * week, counted in every later week they return — the engagement
    * matrix (cohort_week, week_offset, n_users) every product-analytics
    * pipeline derives from an event log.
    *
    * Weeks are exact integers (epoch-micros DIV micros-per-week), so the
    * whole result is integer arithmetic — fully hash-gated (q_retention).
    *
    * Plan: ONE aggregation by user collects the distinct active weeks
    * (`collect_set` — bounded by the CALENDAR, not by event volume: a
    * user active every week for 20 years holds ~1000 ints) and the
    * cohort week as `min`; explode the set; one bounded aggregation on
    * (cohort, offset). Two shuffles total — user, then the
    * cohort-matrix key space (weeks²/2, a few thousand cells for years
    * of data). No joins, no windows: the user→cohort attach rides the
    * same aggregation that collected the weeks.
    */
  def retentionCohorts(
      events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val weekly = events
      .select(col(userCol),
        expr(s"unix_micros($tsCol) DIV 604800000000").as("__week"))
      .groupBy(userCol)
      .agg(min("__week").as("cohort_week"),
        collect_set("__week").as("__weeks"))
    weekly
      .select(col("cohort_week"), explode(col("__weeks")).as("__week"))
      .groupBy(col("cohort_week"),
        (col("__week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order event-type transition counts — the Markov matrix of
    * user behavior ("view→click 12,041 times, view→abandon 3,455"), the
    * standard input to path analysis and next-event models.
    *
    * `lead` runs over the user-key window ordered by `(ts, event_id)` —
    * a TOTAL order, because consecutive-pair extraction over a
    * tie-ambiguous ordering is partitioning-dependent (the
    * [[rollingEventFeatures]] lag rule); null user/ts rows drop (no
    * ordering to stand in). Per-partition window state is one user's
    * history — the bounded-per-entity premise shared by every operator
    * in this file — and the (from,to) aggregation key space is
    * |event types|², a constant: one user-key exchange plus one
    * map-side-combined aggregate, hash-gated end to end
    * (q_event_transitions).
    */
  def eventTransitions(
      events: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type", idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol)
      .orderBy(expr(s"unix_micros($tsCol)").asc, col(idCol).asc)
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__next", lead(typeCol, 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }
}
