package org.apache.spark.ml.graft

import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}

/** The `private[ml]` keyhole into MLlib's trained tree nodes — the same
  * pattern as [[org.apache.spark.sql.graft]] for Catalyst: a trained
  * `RandomForestClassificationModel` exposes its trees as [[Node]]
  * graphs whose per-leaf CLASS COUNTS (`impurityStats`) are `private
  * [ml]`, yet those counts ARE the model (a forest's probability is the
  * mean over trees of the leaf class fraction — sklearn's
  * `predict_proba` and MLlib's `predictRaw` agree on this). graft's
  * [[graft.ml.Forest]] flattens the node graph into threshold/feature/
  * child arrays for export, codegen'd column scoring, and the replay
  * scorer; this object is the one place that crosses the access
  * boundary. */
object TreeBridge {

  /** A node flattened to engine-neutral fields: `feature < 0` marks a
    * leaf and `vote` its class-1 fraction; otherwise go left iff
    * `x(feature) <= threshold`. */
  final case class FlatNode(feature: Int, threshold: Double,
                            left: Node, right: Node, vote: Double)

  /** Flatten one node. Fails loudly on a categorical split (graft's
    * feature bases are all continuous) and on a leaf whose stats are
    * not binary-classification shaped. */
  def flatten(n: Node): FlatNode = n match {
    case in: InternalNode =>
      in.split match {
        case cs: ContinuousSplit =>
          FlatNode(cs.featureIndex, cs.threshold, in.leftChild,
            in.rightChild, Double.NaN)
        case other =>
          throw new IllegalArgumentException(
            s"forest export supports continuous splits only, got $other")
      }
    case lf: LeafNode =>
      val stats = lf.impurityStats.stats
      require(stats.length == 2,
        s"forest export is binary-classification semantics; " +
          s"leaf has ${stats.length} classes")
      val total = stats.sum
      require(total > 0, "leaf with zero training instances")
      // MLlib predictRaw: votes(i) += stats(i) / total per tree — the
      // class-1 fraction IS the tree's vote
      FlatNode(-1, Double.NaN, null, null, stats(1) / total)
  }
}
