package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Integer PageRank: hand-computed two-iteration values on a star graph,
  * the isolated-node teleport floor, and hub-over-member centrality on a
  * template-hub shape (the property dup CLUSTERING alone misses).
  */
class GraphSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-graph-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def ranks(nodeIds: Seq[Long], edges: Seq[(Long, Long)], iters: Int) = {
    import spark.implicits._
    Graph.pageRank(
      nodeIds.toDF("id"),
      edges.toDF("id_a", "id_b"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("pageRank: exact two-iteration integer values on a star; isolated node floors") {
    // star 1-{2,3}, node 4 isolated; deg: 1->2, 2->1, 3->1
    // it1: r(1)=150000+85%*2000000=1850000; r(2)=r(3)=150000+85%*500000=575000
    // it2: r(1)=150000+85%*1150000=1127500; r(2)=r(3)=150000+85%*925000=936250
    val r = ranks(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (1L, 3L)), iters = 2)
    assert(r == Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L,
      4L -> 150000L))
  }

  test("pageRank: a template hub outranks members of a detached clique") {
    // hub 10 touches five otherwise-disjoint docs; 20-21 are a pair
    val edges = (1L to 5L).map(i => (10L, i)) ++ Seq((20L, 21L))
    val r = ranks((1L to 5L) ++ Seq(10L, 20L, 21L), edges, iters = 3)
    assert(r(10L) > r(20L) && r(10L) > r(1L),
      s"hub must outrank both pair members and its own leaves: $r")
  }

  test("pageRank: reliable-checkpoint knob yields identical ranks") {
    import spark.implicits._
    // checkpointEvery=2 fires the mid-run checkpoint at iteration 2 of 5;
    // ranks must be bit-identical to the unchopped lineage
    val nodes = ((1L to 5L) ++ Seq(10L, 20L, 21L)).toDF("id")
    val edges = ((1L to 5L).map(i => (10L, i)) ++ Seq((20L, 21L))).toDF("id_a", "id_b")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_pr_ck").toString
    val reliable = Graph.pageRank(nodes, edges, iterations = 5,
        checkpointDir = Some(ckDir), checkpointEvery = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Graph.pageRank(nodes, edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == plain)
    assert(new java.io.File(ckDir).listFiles().nonEmpty,
      "reliable checkpoint files must actually be written under the dir")
  }
}
