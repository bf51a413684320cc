package graft.operators

import org.apache.spark.SparkContext

/** Shared checkpoint-dir idempotence for the iterative operators
  * ([[Dedup.components]], [[Graph.pageRank]]): `setCheckpointDir`
  * appends a UUID subdir, so "already set to this dir" means the
  * CURRENT dir's parent equals the requested dir — not substring
  * containment, which a sibling like `/data/ckpt2/uuid` vs a requested
  * `/data/ckpt` satisfies spuriously, silently skipping the set and
  * landing checkpoints in the wrong directory.
  */
private[operators] object Checkpoints {

  /** Sets `sc`'s checkpoint dir to `dir` unless the current one already
    * lives directly under it (URI-normalized parent comparison).
    */
  def ensureCheckpointDir(sc: SparkContext, dir: String): Unit = {
    def normalize(p: String): String = {
      val u = new java.net.URI(p).normalize()
      val s = u.toString
      if (s.endsWith("/") && s.length > 1) s.dropRight(1) else s
    }
    val want = normalize(dir)
    val alreadySet = sc.getCheckpointDir.exists { cur =>
      val n = normalize(cur)
      val parent = n.lastIndexOf('/') match {
        case i if i > 0 => n.substring(0, i)
        case _          => n
      }
      parent == want
    }
    if (!alreadySet) sc.setCheckpointDir(dir)
  }
}
