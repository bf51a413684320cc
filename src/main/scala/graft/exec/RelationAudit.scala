package graft.exec

import graft.analyze.CompiledProject
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Project-level relation audit: for every declared relation, measure how
  * the DATA honors the declaration — unmatched source rows (a lookup that
  * will return NULL), multi-match source rows (a declared `*-1` relation
  * whose join actually FANS OUT — the silent row-inflation bug), and the
  * worst fan-out. This welds the [[graft.operators.Integrity]] discipline
  * onto the reference-parity YAML world: the relation expressions
  * themselves (rendered exactly as [[SourcePlanner]] renders them for the
  * real joins — same `[This]`/`[Related]` binding, same hub columns, so
  * rule-keyed and multi-conjunct relations audit correctly) drive the
  * audit joins, no hand-typed key lists.
  *
  * Shape per relation: source hub LEFT JOIN related hub on the rendered
  * condition, grouped by a per-source-row id to count matches (the id is
  * `monotonically_increasing_id` — unique within this execution, which is
  * all a count-by-row needs), then a single-row rollup. The match-count
  * aggregation's key is unique by construction ⇒ skew-free; the join
  * itself inherits whatever shape the relation has (equi conjuncts become
  * hash joins exactly as in the planner path).
  */
object RelationAudit {
  import SourcePlanner.{prefixAll, q}

  def audit(cp: CompiledProject, hub: String => DataFrame): DataFrame =
    cp.project.relations.map(r => auditOne(cp, hub, r.name)).reduce(_.unionAll(_))

  /** [[audit]] over PRUNED hubs: each audit join needs only the columns
    * the relation expression binds (plus uv-flag companions), so the hub
    * provider plans just those rules — raw-attribute relations audit
    * against bare source scans instead of re-building the full enriched
    * hub (its whole lookup/aggregate join tree) once per relation.
    * Identical counts: rule columns that don't key the join cannot change
    * which rows match. Caveat: that equivalence assumes the pruned-away
    * rule JOINS don't inflate hub rows — a declared `*-1` lookup that
    * actually fans out (the very defect the audit exists to surface)
    * multiplies source_rows in [[audit]]'s full hubs but not here, so the
    * pruned counts reflect UN-inflated source rows. That is the more
    * useful number (each source row audited once), but it differs from
    * audit() exactly when some unrelated relation is already broken.
    */
  def auditPruned(cp: CompiledProject, runner: Runner): DataFrame =
    audit(cp, runner.hubProvider(graft.analyze.Pruner.closure(cp, neededRules(cp))))

  /** Rule-typed attributes each relation binds, per source — the pruning
    * roots for [[auditPruned]] (raw attributes are free; Pruner.closure
    * expands rule-on-rule deps — but uv-flag companions only for PATH
    * hops, not root seeds, so the guard columns [[auditOne]] ANDs into
    * joins keyed on a unique_flag rule must be seeded here explicitly,
    * mirroring auditOne's guard logic; without them the pruned related
    * hub lacks `<rule>_uv_flag` and the audit join fails to resolve).
    */
  private def neededRules(cp: CompiledProject): Map[String, Set[String]] =
    cp.project.relations.flatMap { r =>
      val rel = cp.relations(r.name)
      val rd = rel.relation
      rel.expr.params.indices.flatMap { i =>
        val p = rel.expr.params(i)
        if (!rel.isRule(i)) Nil
        else if (rel.sides(i) == "This") Seq(rd.sourceName -> p.attribute)
        else {
          val guard = cp.project.source(rd.relatedName).rules
            .find(_.name == p.attribute).filter(_.uniqueFlag)
            .map(_ => rd.relatedName -> (p.attribute + "_uv_flag"))
          Seq(rd.relatedName -> p.attribute) ++ guard
        }
      }
    }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }

  def auditOne(
      cp: CompiledProject, hub: String => DataFrame, name: String): DataFrame = {
    val rel = cp.relations(name)
    val rd = rel.relation
    val s = prefixAll(hub(rd.sourceName), "__s_")
      .withColumn("__sid", monotonically_increasing_id())
    val r = prefixAll(hub(rd.relatedName), "__r_")
      .withColumn("__rmark", lit(true))
    val rendered = rel.expr.render { i =>
      val p = rel.expr.params(i)
      val pfx = if (rel.sides(i) == "This") "__s_" else "__r_"
      q(pfx + p.attribute) + p.keys.map(k => "." + q(k)).mkString
    }
    // unique-join guard parity (J6): the planner ANDs the `<rule>_uv_flag`
    // companion into joins keyed on a unique_flag rule — the audit must
    // measure the join the planner will RUN, not the bare expression
    // (without this, a unique-filtered relation audits as a fan-out)
    val guards = rel.expr.params.indices.flatMap { i =>
      val p = rel.expr.params(i)
      if (rel.sides(i) != "Related" || !rel.isRule(i)) None
      else cp.project.source(rd.relatedName).rules
        .find(_.name == p.attribute).filter(_.uniqueFlag)
        .map(_ => q("__r_" + p.attribute + "_uv_flag"))
    }.distinct
    val cond = (s"($rendered)" +: guards).mkString(" AND ")
    val oneRelated = rd.cardinality.relatedOne
    s.join(r, expr(cond), "left")
      .groupBy(col("__sid"))
      .agg(count(col("__rmark")).as("__m"))
      .agg(
        count(lit(1)).as("source_rows"),
        count(when(col("__m") === 0, lit(1))).as("unmatched_source_rows"),
        count(when(col("__m") > 1, lit(1))).as("multi_match_source_rows"),
        coalesce(max(col("__m")), lit(0L)).as("max_matches"))
      .select(lit(rd.name).as("relation"),
        lit(rd.cardinality.code).as("cardinality"),
        col("source_rows"), col("unmatched_source_rows"),
        col("multi_match_source_rows"), col("max_matches"),
        // a *-1 declaration with observed fan-out is a broken contract;
        // 1-M/M-M fan-out is the declared shape, not a violation
        (if (oneRelated) col("multi_match_source_rows") else lit(0L))
          .as("cardinality_violations"))
  }

  /** True when any relation with a `*-1` declaration fans out — the
    * one-line gate a pipeline can assert before trusting its lookups.
    */
  def hasViolations(auditResult: DataFrame): Boolean =
    auditResult.filter(col("cardinality_violations") > 0).limit(1).count() > 0
}
