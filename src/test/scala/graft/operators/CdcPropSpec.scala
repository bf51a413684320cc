package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

/** Cross-operator CDC consistency: the SCD2 history's CURRENT rows must
  * equal the [[CorpusPipeline.applyChanges]] fold of the same change log
  * over an empty base — two independent implementations of "what does
  * the table look like now" (a lead window building intervals vs a
  * last-writer-wins max-struct fold + outer join) that can only agree if
  * both orderings, both delete semantics, and both payload selections
  * are right. Random logs exercise what example tests under-sample:
  * delete-then-reinsert chains, delete-only ids, long upsert runs, and
  * ids absent entirely. Also pins the interval invariants on every
  * instance: per id, intervals never overlap (each valid_to is at most
  * the next valid_from — EQUAL when the next change is the next upsert,
  * strictly less when a delete closed the gap), only the last interval
  * may be open, at most one row is current, and every upsert in the log
  * appears exactly once.
  */
object CdcPropSpec extends Properties("CorpusPipeline.scd2History") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20) // each case runs Spark jobs

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cdc-prop")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A log with unique (id, seq) — the documented caller contract —
    * random ops and payloads.
    */
  private val logGen: Gen[List[(Long, Long, String, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(1L, 8L), Gen.choose(1L, 9L),
      Gen.oneOf("upsert", "delete"), Gen.alphaLowerStr.map(_.take(4))))
      .map(_.groupBy(r => (r._1, r._2)).values.map(_.head).toList)
      .map(_.map { case (id, seq, op, pay) =>
        (id, seq, op, if (op == "delete") null else s"v$pay")
      })

  // NoShrink: scalacheck shrinking mutates the op strings toward "",
  // which violates the generator's upsert/delete contract
  property("current rows equal the applyChanges fold; intervals chain") =
    forAllNoShrink(logGen) { log =>
      import spark.implicits._
      val ch = log.toDF("doc_id", "seq", "op", "text")
      val hist = CorpusPipeline.scd2History(ch)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))

      // 1) current set == applyChanges over an empty base
      val emptyBase = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val folded = CorpusPipeline.applyChanges(emptyBase, ch)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val current = hist.filter(_._5).map(t => (t._1, t._2)).toSet
      val currentMatchesFold = current == folded

      // 2) per-id invariants: no overlap (valid_to <= next valid_from;
      // a delete widens the gap, a direct succession closes it exactly),
      // only the last interval open, at most one current
      val perId = hist.groupBy(_._1).values.forall { rows =>
        val sorted = rows.sortBy(_._3)
        val noOverlap = sorted.sliding(2).forall {
          case Array((_, _, _, Some(to), _), (_, _, from, _, _)) => to <= from
          case _ => true
        }
        val closedThenOpen = sorted.dropRight(1).forall(_._4.isDefined)
        noOverlap && closedThenOpen && rows.count(_._5) <= 1
      }

      // 3) every upsert appears exactly once
      val upserts = log.filter(_._3 == "upsert")
        .map(t => (t._1, t._2)).sorted
      val emitted = hist.map(t => (t._1, t._3)).toSeq.sorted
      val complete = upserts == emitted

      currentMatchesFold && perId && complete
    }
}
