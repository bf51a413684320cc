package graft.operators

import org.apache.spark.sql.DataFrame
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
}
