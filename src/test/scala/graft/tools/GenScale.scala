package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 headroom-fixture generator: scales /root/testdata/sf0.1 by an
  * integer factor (default 10) via deterministic replication with
  * disjoint key spaces, writing to a target dir (default
  * /root/repo/testdata/sf1 — gitignored; /root/testdata itself is
  * read-only).
  *
  * Design goal is HONEST scaling for the operators SCALE.md makes claims
  * about, not distributional novelty:
  *
  *  - TPC-H tables: each replica r offsets every surrogate key by
  *    r*(max+1), so per-replica join fan-outs, group sizes, and skew are
  *    EXACTLY those of sf0.1 while keys never collide across replicas —
  *    scans/joins/aggs scale linearly in rows.
  *  - region/nation are fixed dimensions (TPC-H semantics): copied once;
  *    replicated customers keep their original nationkey.
  *  - events: event_id/user_id offset per replica → 10x users, identical
  *    per-user session structure (sessionize state scales linearly).
  *  - documents: doc_id offset; for r>0 every token gets a per-replica
  *    suffix, so INTRA-replica duplicate/near-dup structure is preserved
  *    verbatim while CROSS-replica shingle sets are disjoint (jaccard 0,
  *    far below the 0.5 near-dup threshold) — duplicate pairs scale
  *    linearly (10x), never quadratically (100x), matching how duplicate
  *    density behaves in a real growing corpus.
  *  - embeddings: vec_id offset; for r>0 each component is jittered
  *    multiplicatively by a hash-derived factor in [1-1.5, 1+1.5]
  *    (expected cosine to the parent = 1/sqrt(1+var) ≈ 0.76 over 64
  *    dims — comfortably below every near-dup/SemDeDup threshold; the
  *    first ±0.8 attempt landed AT the 0.90 SemDeDup threshold and
  *    minted 10k phantom cross-replica dups), so embedding near-dup
  *    pairs scale linearly while rough cluster geometry survives.
  *
  * Deterministic end to end: replication is positional, jitter comes from
  * hash(vec_id, i, r) — two runs produce identical tables.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/testdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated table subset for surgical re-gen
    val tableFilter: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val spark = SparkSession.builder().master("local[16]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read ts as long — the
      // engine's Events.normalizeTs accepts either representation
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    /** Union `factor` replicas, remapping each (table, column) key by
      * r*(max+1) — long/int key spaces stay disjoint across replicas. */
    def replicate(df: DataFrame, keyOffsets: Map[String, Long],
        perReplica: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame = {
      (0 until factor).map { r =>
        val shifted = keyOffsets.foldLeft(df) { case (d, (c, span)) =>
          d.withColumn(c, (col(c) + lit(r * span)).cast(df.schema(c).dataType))
        }
        perReplica(shifted, r)
      }.reduce(_ unionByName _)
    }

    def span(df: DataFrame, c: String): Long =
      df.agg(max(col(c).cast("long"))).as[Long].head() + 1L

    val customer = read("customer"); val supplier = read("supplier")
    val part = read("part"); val orders = read("orders")
    val lineitem = read("lineitem"); val events = read("events")
    val documents = read("documents"); val embeddings = read("embeddings")

    val custSpan = span(customer, "c_custkey")
    val suppSpan = span(supplier, "s_suppkey")
    val partSpan = span(part, "p_partkey")
    val orderSpan = span(orders, "o_orderkey")
    val eventSpan = span(events, "event_id")
    val userSpan = span(events, "user_id")
    val docSpan = span(documents, "doc_id")
    val vecSpan = span(embeddings, "vec_id")

    def write(df: DataFrame, t: String, files: Int): Unit =
      if (tableFilter.forall(_.contains(t)))
        df.repartition(files).write.mode("overwrite").parquet(s"$out/$t.parquet")

    // fixed dimensions: copied once (TPC-H does not scale these)
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(replicate(customer, Map("c_custkey" -> custSpan)), "customer", 4)
    write(replicate(supplier, Map("s_suppkey" -> suppSpan)), "supplier", 1)
    write(replicate(part, Map("p_partkey" -> partSpan)), "part", 2)
    write(replicate(orders, Map(
      "o_orderkey" -> orderSpan, "o_custkey" -> custSpan)), "orders", 8)
    write(replicate(lineitem, Map(
      "l_orderkey" -> orderSpan, "l_partkey" -> partSpan,
      "l_suppkey" -> suppSpan)), "lineitem", 16)
    // ts arrives in whatever shape the driver fixture currently ships
    // (LONG nanos under nanosAsLong, TIMESTAMP, or TIMESTAMP_NTZ — the
    // same three shapes Events.normalizeTs handles); write it back as
    // TIMESTAMP micros so the sf1 fixture binds against TIMESTAMP-typed
    // DuckDB oracles the same way the driver SFs do. Nanos path uses
    // integer DIV (ns values exceed double's 2^53 mantissa); the NTZ cast
    // is value-preserving under the UTC-pinned session.
    val tsToMicros = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(CAST(ts DIV 1000 AS LONG))")
      case org.apache.spark.sql.types.TimestampNTZType =>
        col("ts").cast("timestamp")
      case _ => col("ts")
    }
    write(replicate(events, Map(
      "event_id" -> eventSpan, "user_id" -> userSpan))
      .withColumn("ts", tsToMicros),
      "events", 8)

    // documents: per-replica token suffix ⇒ intra-replica dup structure
    // preserved, cross-replica jaccard 0; n_chars recomputed to match
    write(replicate(documents, Map("doc_id" -> docSpan), (d, r) =>
      (if (r == 0) d
       else d.withColumn("text",
         regexp_replace(col("text"), "(\\S+)", "$1" + s"x$r")))
        .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents", 16)

    // embeddings: per-replica multiplicative jitter in [-0.5, 2.5] per
    // component (hash-derived, deterministic) ⇒ cosine to parent ≈ 0.76,
    // below every near-dup threshold; element type stays float
    write(replicate(embeddings, Map("vec_id" -> vecSpan), (d, r) =>
      if (r == 0) d
      else d.withColumn("embedding", expr(
        s"""transform(embedding, (x, i) ->
           |  CAST(x * (1.0 + (pmod(hash(vec_id, i, $r), 3001) - 1500) / 1000.0)
           |       AS FLOAT))""".stripMargin))),
      "embeddings", 8)

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$out/$t.parquet").count()}")
    println(s"GENSCALE done factor=$factor out=$out ${counts.mkString(" ")}")
    spark.stop()
  }
}
