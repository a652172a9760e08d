package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchy / forest traversal operators.
  *
  * The reference maintains a parent_id/level forest over docs
  * (`/root/reference/src/svs/kb.py:85-92`) and exposes a DFS pre-order
  * traversal (`kb.py:1580-1593`, order pinned by
  * `tests/test_kb.py:1652-1688`). Spark-first re-expression: BFS by level
  * via iterative self-joins materializing the root-to-node id path; DFS
  * pre-order is then simply the lexicographic order of those paths
  * (SURVEY §7.4). Each iteration is one shuffle-free broadcast-join when
  * the frontier is small; the loop terminates when a level is empty, so
  * total work is O(depth) jobs — at 100 TB the depth (not the node count)
  * bounds the number of passes.
  */
object Hierarchy {

  /** Materialize id-paths for a forest given (id, parentId) columns.
    *
    * @param nodes     DataFrame with the node id column `idCol` and parent
    *                  column `parentCol` (parent == null / isRoot marks roots)
    * @param isRoot    predicate selecting root rows
    * @param maxDepth  safety bound on iterations
    * @return nodes with `path ARRAY<LONG>` (root..self) and `depth INT`
    */
  def withPaths(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      isRoot: Column,
      maxDepth: Int = 64): DataFrame = {
    val spark = nodes.sparkSession
    val base = nodes.select(col(idCol).cast("long").as("id"),
      col(parentCol).cast("long").as("parent_id"))

    var frontier = base.filter(isRoot)
      .select(col("id"), array(col("id")).as("path"))
      .localCheckpoint(eager = true)
    var acc = frontier
    var depth = 1
    var done = frontier.isEmpty
    while (!done && depth < maxDepth) {
      val children = base.filter(!isRoot)
      val next = children.join(frontier.withColumnRenamed("id", "pid"),
          children("parent_id") === col("pid"))
        .select(children("id"),
          concat(col("path"), array(children("id"))).as("path"))
        .localCheckpoint(eager = true)
      done = next.isEmpty
      if (!done) {
        acc = acc.union(next)
        frontier = next
        depth += 1
      }
    }
    acc.select(col("id"), col("path"), size(col("path")).as("depth"))
  }

  /** DFS pre-order rank = 1-based position in the lexicographic order of
    * id-paths. Computed with a range-partitioned RDD sort + zipWithIndex —
    * never a global single-partition Window, so the rank assignment scales
    * with the forest instead of serializing it through one task.
    *
    * @param paths output of [[withPaths]] (id, path, depth)
    * @return (id, path, depth, preorder LONG)
    */
  def withPreorder(paths: DataFrame): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    import scala.math.Ordering.Implicits._
    paths.select(col("id"), col("path"), col("depth").cast("int"))
      .rdd
      .map(r => (r.getSeq[Long](1).toList, (r.getLong(0), r.getInt(2))))
      .sortBy(_._1)
      .zipWithIndex()
      .map { case ((path, (id, depth)), idx) => (id, path, depth, idx + 1L) }
      .toDF("id", "path", "depth", "preorder")
  }
}
