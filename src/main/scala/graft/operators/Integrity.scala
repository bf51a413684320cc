package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Referential-integrity audit across the star schema — the data-quality
  * gate a pipeline runs before joining a freshly landed fact against its
  * dimensions. At 100 TB an orphaned foreign key does not error: an inner
  * join silently drops the rows and the loss surfaces weeks later as a
  * metric drift. This operator makes the loss a first-class, cheap,
  * per-relation number.
  *
  * Scale shape, per relation: the child is reduced to a (key, row-count)
  * pre-aggregation FIRST (two-phase map-side combine — the join input is
  * bounded by DISTINCT child keys, never child rows, and a skewed fk
  * burns in the agg where AQE can split it, not in the join); the parent
  * side contributes its unique key column only. One full-outer key join
  * (parent keys are unique ⇒ skew-free on that side), then a single-row
  * aggregation that reads every population off the join's null pattern —
  * null fks collapse to one GROUP BY group that the `===` condition
  * (correctly) never matches, so they are reported as nulls, never
  * mistaken for orphan keys.
  */
object Integrity {

  /** One-row audit of `child.fkCol → parent.pkCol`:
    * child_rows / null_fk_rows (scan-side facts), orphan_rows /
    * orphan_keys (child keys with no parent), parent_keys /
    * unreferenced_parent_keys (parent keys no child row points at —
    * non-zero even on a consistent warehouse, e.g. customers who never
    * ordered).
    */
  def fkAudit(
      child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String, relation: String): DataFrame = {
    // GROUP BY collapses all null fks into ONE group; `===` never matches
    // null, so after the full-outer join the three populations partition
    // cleanly by null pattern: null-fk group (__k null, __c set), orphan
    // key (__k set, __pk null), unreferenced parent (__c null). One child
    // scan, one join, one single-row rollup — no second pass for totals.
    val g = child.groupBy(col(fkCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val p = parent.select(col(pkCol).as("__pk")).distinct()
    g.join(p, col("__k") === col("__pk"), "full_outer")
      .agg(
        coalesce(sum(col("__c")), lit(0L)).as("child_rows"),
        coalesce(sum(when(col("__k").isNull && col("__c").isNotNull,
          col("__c"))), lit(0L)).as("null_fk_rows"),
        coalesce(sum(when(col("__k").isNotNull && col("__pk").isNull,
          col("__c"))), lit(0L)).as("orphan_rows"),
        count(when(col("__k").isNotNull && col("__pk").isNull, lit(1)))
          .as("orphan_keys"),
        count(col("__pk")).as("parent_keys"),
        count(when(col("__c").isNull, lit(1))).as("unreferenced_parent_keys"))
      .select(lit(relation).as("relation"), col("child_rows"),
        col("null_fk_rows"), col("orphan_rows"), col("orphan_keys"),
        col("parent_keys"), col("unreferenced_parent_keys"))
  }

  /** The star-schema audit: every fact→dimension edge in the warehouse,
    * one row each — relations evaluate independently (separate bounded
    * joins), the UNION is free.
    */
  def audit(relations: Seq[(DataFrame, String, DataFrame, String, String)]): DataFrame =
    relations.map { case (c, fk, p, pk, name) => fkAudit(c, fk, p, pk, name) }
      .reduce(_.unionAll(_))

  /** Key-uniqueness audit — the other half of referential integrity: a
    * "primary" key that is not actually unique silently FANS OUT every
    * downstream join (row counts inflate instead of rows dropping — the
    * dual failure to [[fkAudit]]'s orphan loss). One row per declared
    * key: total rows, distinct keys, duplicated keys and the rows they
    * carry, the worst key's multiplicity, and rows with any null key
    * part.
    *
    * Shape: ONE two-phase (key, count) aggregation — map-side combine
    * bounds the exchange at distinct keys, a hot duplicate key burns in
    * the agg where AQE splits it — then a single-row rollup. Composite
    * keys group on all parts; rows with a null in any key part are
    * counted (`null_key_rows`) but follow SQL GROUP BY semantics (nulls
    * compare equal when grouping), so an all-null-key table reports one
    * key with full multiplicity — the loud signal, not a silent pass.
    */
  def pkAudit(df: DataFrame, keyCols: Seq[String], relation: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val anyNull = keyCols.map(col(_).isNull).reduce(_ || _)
    val g = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"),
        coalesce(sum(when(anyNull, lit(1L))), lit(0L)).as("__n"))
    g.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n_rows"),
      count(lit(1)).as("n_keys"),
      count(when(col("__c") > 1, lit(1))).as("dup_keys"),
      coalesce(sum(when(col("__c") > 1, col("__c"))), lit(0L)).as("dup_rows"),
      coalesce(max(col("__c")), lit(0L)).as("max_multiplicity"),
      coalesce(sum(col("__n")), lit(0L)).as("null_key_rows"))
      .select(lit(relation).as("relation"), col("n_rows"), col("n_keys"),
        col("dup_keys"), col("dup_rows"), col("max_multiplicity"),
        col("null_key_rows"))
  }

  /** Multi-table key audit, one row per (table, declared key). */
  def pkAuditAll(keys: Seq[(DataFrame, Seq[String], String)]): DataFrame =
    keys.map { case (df, kc, name) => pkAudit(df, kc, name) }
      .reduce(_.unionAll(_))

  /** Join-key skew audit — the pre-flight a 100 TB join runs BEFORE
    * choosing its strategy: per-key frequency distribution summarized as
    * max frequency, the heaviest key's share, the p99 frequency, and the
    * Gini coefficient of the key-frequency distribution (0 = uniform,
    * →1 = one key owns everything). These are exactly the numbers that
    * decide between a plain hash join, AQE skew splitting, and explicit
    * salting (the `Skew.saltedAgg` knob) — and whether a broadcast
    * anti-join hot-set cap (the Dedup/TextAnalysis routing discipline)
    * is worth building.
    *
    * Scale shape: one two-phase key count, then EVERYTHING runs on the
    * FREQUENCY HISTOGRAM (freq → #keys at that freq) — bounded by
    * distinct frequency VALUES, which Zipf keeps tiny — never a rank
    * window over the key space (1e9 join keys would make that one
    * task's partition; the [[graft.operators.Stats.quantileBins]]
    * histogram-side discipline). Rank sums come from the tie-grouped
    * closed form: keys at frequency f occupy ranks
    * (cumBefore, cumBefore + k], contributing f·(k·cumBefore +
    * k(k+1)/2) to Σ rank·freq — tie-invariant, so the Gini
    * `(2·S − (K+1)·N) / (K·N)` is deterministic. Sums accumulate in
    * DECIMAL(38,0) (rank·freq products pass BIGINT range at petabyte
    * key spaces); the emitted gini derives in lockstep doubles (the
    * chi-square discipline). NULL keys group like any other key — a
    * null-heavy fk IS a skew source.
    */
  def skewAudit(
      df: DataFrame, keyCols: Seq[String], relation: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val hist = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__f"))
      .groupBy("__f").agg(count(lit(1)).as("__k"))
    val w = Window.orderBy(col("__f").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val staged = hist
      .withColumn("__cumb", coalesce(sum("__k").over(w), lit(0L)))
    // Lift every product to DECIMAL(38,0) BEFORE multiplying and keep
    // the sum() buffer itself decimal: a BIGINT-side sum(__f * __k)
    // wraps silently (non-ANSI) or throws (ANSI) at petabyte-scale key
    // counts, which is exactly the regime this audit exists for. The
    // triangle k(k+1)/2 splits on parity so neither factor's product
    // ever forms in BIGINT (k itself can exceed 3e9 keys-per-frequency).
    val triangle =
      "CASE WHEN __k % 2 = 0 THEN CAST(__k DIV 2 AS DECIMAL(38,0)) * (__k + 1) " +
      "ELSE CAST((__k + 1) DIV 2 AS DECIMAL(38,0)) * __k END"
    val totals = staged.agg(
      expr("sum(CAST(__f AS DECIMAL(38,0)) * __k)").as("__n"),
      coalesce(sum("__k"), lit(0L)).as("__keys"),
      coalesce(max("__f"), lit(0L)).as("__maxf"),
      expr("sum(CAST(__f AS DECIMAL(38,0)) * " +
        s"(CAST(__k AS DECIMAL(38,0)) * __cumb + ($triangle)))").as("__s"))
    staged.crossJoin(broadcast(totals))
      .agg(
        min(when(expr("(__cumb + __k) * 100 >= 99 * __keys"), col("__f")))
          .as("__p99"),
        min("__n").as("__n"), min("__keys").as("__keys"),
        min("__maxf").as("__maxf"), min("__s").as("__s"))
      .select(lit(relation).as("relation"),
        expr("CAST(__n AS BIGINT)").as("n_rows"),
        col("__keys").as("n_keys"),
        col("__maxf").as("max_freq"),
        expr("CAST(1000000 * CAST(__maxf AS DECIMAL(38,0)) DIV __n AS BIGINT)")
          .as("top1_share_micro"),
        col("__p99").as("p99_freq"),
        expr("round(CAST(2 * __s - CAST(__keys + 1 AS DECIMAL(38,0)) * __n " +
          "AS DOUBLE) / CAST(CAST(__keys AS DECIMAL(38,0)) * __n AS DOUBLE), 6)")
          .as("gini"))
  }

  /** Multi-relation skew audit, one row per (table, join key). */
  def skewAuditAll(keys: Seq[(DataFrame, Seq[String], String)]): DataFrame =
    keys.map { case (df, kc, name) => skewAudit(df, kc, name) }
      .reduce(_.unionAll(_))
}
