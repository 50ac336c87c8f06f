package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators. Spark has no recursive CTE; the category
  * transitive closure of SURVEY.md A3 (`Category(title).articles(
  * recurse=True)`, reference src/__init__.py:229-254) is the loop-of-
  * joins-until-fixpoint pattern.
  *
  * Scale shape: each iteration is one equi-join frontier⋈edges plus an
  * anti-join against the accumulated closure; the frontier shrinks
  * geometrically for DAGs (depth-bounded), `localCheckpoint` cuts the
  * growing lineage so plan size stays constant across iterations.
  */
object GraphOps {

  /** All (node, ancestor) pairs reachable via `edges(child, parent)`.
    * Fixpoint iteration with lineage checkpointing. */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 40): DataFrame = {
    val e = edges.select(col("child"), col("parent")).localCheckpoint()
    var closure = e.select(col("child").as("node"), col("parent").as("ancestor"))
      .localCheckpoint()
    var frontier = closure
    var iter = 0
    while (iter < maxIter && !frontier.isEmpty) {
      val stepped = frontier
        .join(e, frontier("ancestor") === e("child"))
        .select(frontier("node"), e("parent").as("ancestor"))
        .distinct()
      frontier = stepped.join(closure, Seq("node", "ancestor"), "left_anti")
        .localCheckpoint()
      closure = closure.unionByName(frontier).localCheckpoint()
      iter += 1
    }
    closure
  }
}
