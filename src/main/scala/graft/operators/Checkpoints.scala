package graft.operators

import org.apache.hadoop.fs.Path
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
    * lives directly under it. Both sides are compared as
    * filesystem-QUALIFIED Hadoop paths: `getCheckpointDir` returns a
    * qualified URI (`file:/tmp/ckpt/uuid`) while callers pass plain
    * paths (`/tmp/ckpt`) — a string/URI comparison never matches, which
    * silently re-points the GLOBAL dir (new UUID subdir) on every call
    * and defeats the set-once contract for concurrent jobs sharing it.
    * Hadoop `Path` also tolerates spaces and odd characters that
    * `java.net.URI` rejects outright.
    */
  def ensureCheckpointDir(sc: SparkContext, dir: String): Unit = {
    def qualified(p: String): Path = {
      val path = new Path(p)
      path.getFileSystem(sc.hadoopConfiguration).makeQualified(path)
    }
    val want = qualified(dir)
    val alreadySet = sc.getCheckpointDir.exists { cur =>
      Option(qualified(cur).getParent).contains(want)
    }
    if (!alreadySet) sc.setCheckpointDir(dir)
  }
}
