package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of near-dedup: candidate pairs are edges, and every
  * document in a connected cluster collapses onto the cluster's smallest
  * id (the transitive closure the reference-style edge-based policy in
  * [[DedupPipeline.nearDedup]] deliberately skips).
  *
  * Each round, every node takes the min of its own label and its
  * neighbors' labels; convergence after D rounds where D = the largest
  * component diameter. Dedup clusters are shallow (near-dups of a common
  * ancestor), so D is small in practice; the loop is capped and each
  * round is one shuffle-join + one aggregate. Labels only decrease, so
  * the label sum is a monotone convergence witness — checking it is one
  * scalar aggregate per round, no full-table comparison join. At extreme
  * diameters the two-hop "large-star/small-star" contraction would halve
  * the rounds; for dedup graphs the plain propagation wins on constant
  * factors.
  *
  * DataFrames are persisted per round and the previous round unpersisted,
  * so lineage stays O(1) and re-execution doesn't recompute the whole
  * history.
  */
object GraphOps {

  /** Connected components of the undirected graph given by `edges`
    * (columns id1, id2) over `nodes` (column id). Returns (id, comp)
    * where comp = the smallest id reachable from the node (isolated
    * nodes map to themselves). Deterministic under any partitioning. */
  def connectedComponents(edges: DataFrame, nodes: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("id1").as("src"), col("id2").as("dst"))
      .unionByName(edges.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .persist()
    var labels = nodes.select(col("id"), col("id").as("comp")).persist()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
    var prev = labelSum(labels)
    var i = 0
    var converged = false
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .select(col("src").as("id"), col("comp"))
      val next = labels.unionByName(nbrMin)
        .groupBy("id").agg(min("comp").as("comp"))
        .persist()
      val cur = labelSum(next)
      labels.unpersist()
      labels = next
      converged = cur.compareTo(prev) == 0 // labels only decrease
      prev = cur
      i += 1
    }
    sym.unpersist()
    labels
  }
}
