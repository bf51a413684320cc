package graft.analyze

import graft.core._
import scala.collection.mutable

/** One traversal step over a relation edge.
  *
  * Relations are undirected edges traversable both ways; traversing
  * "reverse" (from the related end back to the source end) flips which
  * side `[This]`/`[Related]` bind to and which end's cardinality governs
  * the hop (reference: u_relation_with_cardinality.sql:9-17).
  */
final case class Hop(relation: RelationDef, reverse: Boolean) {
  def isSelf: Boolean = relation.sourceName == relation.relatedName
  def from: String = if (reverse) relation.relatedName else relation.sourceName
  def to: String = if (reverse) relation.sourceName else relation.relatedName

  /** True when at most one related row exists per input row (lookup hop).
    * Forward traversal is governed by the related end's cardinality,
    * reverse by the source end's; self-relations always traverse
    * "forward" (reference: u_relation_with_cardinality.sql:11-14).
    */
  def cardOne: Boolean =
    if (reverse) relation.cardinality.sourceOne else relation.cardinality.relatedOne

  /** Stable key for join memoization / path identity. */
  def key: String = relation.name + (if (reverse) "<" else ">")
}

/** Relation-path inference over the project's join graph.
  *
  * Re-implements the semantics of the reference's recursive path search
  * (reference: u_get_next_relation_path.sql:47-128, u_get_next_hop.sql:9-28,
  * u_validate_relation_chain.sql:30-52): bounded BFS where every hop but the
  * last must be cardinality 1, the last hop's cardinality must match the
  * requested one ('1' for scalar lookups, 'M' for aggregates), relations may
  * not repeat unless re-allowed by an explicit start path, and the chosen
  * path is picked greedily per level by primary-flag, then completeness,
  * then shortest remaining length. Ambiguity (multiple candidate relations
  * at a level with no explicit path) is a compile error.
  */
final class RelGraph(project: Project, maxHopsConfig: Int = RelGraph.DefaultMaxHops) {

  /** Hops leaving `source`. Self-relations produce a single forward hop. */
  def neighbors(source: String): Seq[Hop] =
    project.relations.flatMap { r =>
      if (r.sourceName == r.relatedName)
        if (r.sourceName == source) Seq(Hop(r, reverse = false)) else Nil
      else {
        val fwd = if (r.sourceName == source) Seq(Hop(r, reverse = false)) else Nil
        val rev = if (r.relatedName == source) Seq(Hop(r, reverse = true)) else Nil
        fwd ++ rev
      }
    }

  /** All paths from `from` to `to` where every hop but the last is
    * cardinality 1, bounded at `maxLen` hops. `startPath` re-allows a
    * repeated relation at the position it pins (reference:
    * u_get_next_relation_path.sql:63-67).
    */
  private def enumerate(
      from: String, to: String, maxLen: Int, startPath: Seq[String]): Vector[Vector[Hop]] = {
    val out = Vector.newBuilder[Vector[Hop]]
    def extend(at: String, path: Vector[Hop]): Unit = {
      if (path.nonEmpty && path.last.to == to) out += path
      // only paths whose hops so far are all cardinality 1 can grow
      if (path.length < maxLen && (path.isEmpty || path.last.cardOne)) {
        neighbors(at).foreach { h =>
          val repeatOk =
            !path.exists(_.relation.name == h.relation.name) ||
              startPath.lift(path.length).contains(h.relation.name) ||
              startPath.lift(path.length - 1).contains(h.relation.name)
          if (repeatOk) extend(h.to, path :+ h)
        }
      }
    }
    extend(from, Vector.empty)
    out.result()
  }

  /** Infer the relation path for a rule parameter.
    *
    * @param wantOne true for scalar lookups (last hop cardinality 1),
    *                false for aggregate parameters (last hop 'M')
    * @param startPath explicit relation names pinning the path prefix
    *                  (rule `parameters:` blocks in YAML)
    */
  def inferPath(from: String, to: String, wantOne: Boolean, startPath: Seq[String] = Nil): Vector[Hop] = {
    startPath.foreach { n =>
      if (!project.relationByName.contains(n))
        throw CompileError(s"Relation '$n' does not exist or is not active")
    }
    val maxLen = math.max(maxHopsConfig, startPath.length + 2)
    val all = enumerate(from, to, maxLen, startPath)
    val matching = all.filter(p => p.last.cardOne == wantOne)
    if (matching.isEmpty) {
      if (all.isEmpty)
        throw CompileError(
          s"No active relation paths exist from source `$from` to source `$to` with cardinality " +
            s"${if (wantOne) "1" else "M"}" +
            (if (startPath.nonEmpty) s" using start path ${startPath.mkString("[", ", ", "]")}" else ""))
      else if (wantOne)
        throw CompileError(s"You must use aggregation without OVER clause. Target source `$to`")
      else
        throw CompileError(s"Remove aggregation or add OVER clause. Target source `$to`")
    }

    // Greedy per-level selection (reference: u_get_next_hop.sql ordering:
    // primary_flag DESC, complete_flag DESC, min path length).
    var surviving = matching
    val chosen = Vector.newBuilder[Hop]
    var level = 0
    val maxLevel = matching.map(_.length).max
    while (level < maxLevel) {
      val groups = surviving
        .filter(_.length > level)
        .groupBy(_(level).key)
        .map { case (_, paths) =>
          val hop = paths.head(level)
          val complete = paths.exists(_.length == level + 1)
          val minLen = paths.map(_.length).min
          (hop, complete, minLen, paths)
        }
        .toVector
      val candidates = startPath.lift(level) match {
        case Some(pin) => groups.filter(_._1.relation.name == pin)
        case None      => groups
      }
      if (candidates.isEmpty)
        throw CompileError(
          s"No relations exist for the next relation level ${level + 1}. " +
            s"Starting path ${startPath.mkString("[", ", ", "]")}")
      if (startPath.isEmpty && groups.size > 1)
        throw CompileError(
          s"Multiple relation paths exist for source $to. Specify desired path in rule parameters.")
      val best = candidates
        .sortBy { case (hop, complete, minLen, _) =>
          (!hop.relation.primaryFlag, !complete, minLen)
        }
        .head
      chosen += best._1
      if (best._2 && level + 1 >= startPath.length) return chosen.result()
      surviving = best._4
      level += 1
    }
    throw CompileError(
      s"Reached end of relation path search from `$from` to `$to` (start path " +
        s"${startPath.mkString("[", ", ", "]")})")
  }

  /** Validate an explicit relation chain connects `from` to `to` with the
    * requested final cardinality (reference: u_validate_relation_chain.sql).
    */
  def validateChain(from: String, to: String, wantOne: Boolean, path: Seq[String]): Vector[Hop] = {
    if (path.isEmpty) throw CompileError("Relation path is blank")
    path.foreach { n =>
      if (!project.relationByName.contains(n))
        throw CompileError(s"Relation '$n' does not exist or is not active")
    }
    var at = from
    val hops = Vector.newBuilder[Hop]
    path.zipWithIndex.foreach { case (name, i) =>
      val r = project.relationByName(name)
      val hop =
        if (r.sourceName == r.relatedName) {
          if (at != r.sourceName) throw chainError(from, to, wantOne, path)
          Hop(r, reverse = false)
        } else if (r.sourceName == at) Hop(r, reverse = false)
        else if (r.relatedName == at) Hop(r, reverse = true)
        else throw chainError(from, to, wantOne, path)
      val isLast = i == path.length - 1
      if (!isLast && !hop.cardOne) throw chainError(from, to, wantOne, path)
      if (isLast && (hop.to != to || hop.cardOne != wantOne))
        throw chainError(from, to, wantOne, path)
      hops += hop
      at = hop.to
    }
    hops.result()
  }

  private def chainError(from: String, to: String, wantOne: Boolean, path: Seq[String]) =
    CompileError(
      s"Relation chain ${path.mkString("[", ", ", "]")} does not connect source `$from` " +
        s"to source `$to` with cardinality ${if (wantOne) "1" else "M"}")
}

object RelGraph {
  /** Reference default `max-relation-hops` (u_get_next_relation_path.sql:30-36). */
  val DefaultMaxHops = 4

  /** Topologically order sources by inter-source dependency; cycle = error
    * (reference: svc_generate_queries.sql:18-53, ≤20 levels then
    * "Circular dependencies in sources").
    */
  def topoSort(names: Seq[String], deps: Map[String, Set[String]]): Seq[String] = {
    val remaining = mutable.LinkedHashSet.from(names)
    val done = mutable.LinkedHashSet.empty[String]
    var level = 0
    while (remaining.nonEmpty && level <= 20) {
      val ready = remaining.filter(n => deps.getOrElse(n, Set.empty).forall(d => done.contains(d) || d == n))
      if (ready.isEmpty) throw CompileError("Circular dependencies in sources")
      ready.foreach { n => done += n; remaining -= n }
      level += 1
    }
    if (remaining.nonEmpty) throw CompileError("Circular dependencies in sources")
    done.toSeq
  }
}
