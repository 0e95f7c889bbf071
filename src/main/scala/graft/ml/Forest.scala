package graft.ml

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The RANDOM-FOREST model family — the reference's shipping DEFAULT
  * (`user_tools/nnTraining2/rfModel.py`; `nnConfig.json:174` sets
  * `"modelClass": "rfModel.RfModel"` with `classWeights`,
  * `n_estimators`, `max_depth`), re-expressed the Spark way:
  *
  *   - TRAINING is MLlib's distributed [[RandomForestClassifier]]
  *     through the exact [[Trainer]] seam every other family uses —
  *     the P12(+W7) feature basis in, the M13 weight column as the
  *     classWeights/sampler knob (the reference's sklearn
  *     `class_weight` is a per-class loss weight; MLlib's `weightCol`
  *     is the same semantics stated per row), `featureImportances` out
  *     (rfModel.py's feature_importances_ report).
  *   - The TRAINED ARTIFACT is flattened to engine-neutral arrays
  *     (feature / threshold / left / right / leaf-vote per node — the
  *     shape rfModel.py's joblib blob hides inside sklearn), giving
  *     [[graft.ml.ModelIo]] a portable export and the engine two
  *     serve paths that cannot drift from MLlib's own `transform`:
  *     a JVM loop ([[forward]], the streaming-replay scorer) and a
  *     pure-Catalyst comparison ladder ([[scoreCol]], whole-stage
  *     codegen'd batch scoring with NO model object on the hot path).
  *   - FOREST SEMANTICS (sklearn `predict_proba` == MLlib
  *     `predictRaw`): each tree votes its leaf's class-1 fraction;
  *     the forest probability is the mean vote over trees.
  *
  * Exactness: a tree's forward pass is compare-and-descend ONLY — no
  * multiply, no accumulation — so with integer thresholds and integer
  * leaf votes the whole forest output is an exact integer and the ml8
  * oracle gates the REAL scoring path cross-engine with a plain hash
  * (nested CASE expressions in DuckDB, generated from the same model
  * object — zero FMA hazard by construction, unlike the ml4/ml5 grid
  * bridges).
  *
  * Scale shape: training is MLlib's per-tree distributed histogram
  * aggregation (driver state = the node queue, never the data); batch
  * scoring is per-row codegen'd comparisons with no shuffle and no
  * broadcast (the trees compile INTO the plan); the replay scorer is
  * an O(depth) loop per window. All three survive a 1000-executor
  * corpus untouched. */
object Forest {

  /** One decision tree as flat arrays, rooted at node 0. Node i is a
    * leaf iff `feature(i) < 0`, voting `vote(i)` (its class-1
    * fraction); otherwise descend to `left(i)` when
    * `x(feature(i)) <= threshold(i)` (MLlib [[org.apache.spark.ml.tree
    * .ContinuousSplit]] and sklearn agree on `<=` → left), else
    * `right(i)`. */
  case class Tree(feature: Array[Int], threshold: Array[Double],
                  left: Array[Int], right: Array[Int],
                  vote: Array[Double]) {
    private def n = feature.length
    require(threshold.length == n && left.length == n &&
      right.length == n && vote.length == n, "tree arrays inconsistent")
    require(n > 0, "empty tree")
    for (i <- 0 until n) {
      if (feature(i) >= 0) {
        require(left(i) > i && left(i) < n && right(i) > i && right(i) < n,
          s"tree node $i: children must be forward in-range references")
        require(!threshold(i).isNaN, s"tree node $i: NaN threshold")
      } else require(!vote(i).isNaN, s"tree leaf $i: NaN vote")
    }
    def nNodes: Int = n
  }

  /** A trained forest over a NAMED feature basis: `featureNames` pins
    * the assembly order the trees index into — a renamed or reordered
    * basis must fail loudly at scoring time, not descend silently on
    * the wrong feature. */
  case class ForestModel(featureNames: Seq[String], trees: Array[Tree]) {
    require(trees.nonEmpty, "forest with zero trees")
    private val nF = featureNames.size
    trees.zipWithIndex.foreach { case (t, ti) =>
      t.feature.foreach(f => require(f < nF,
        s"tree $ti indexes feature $f beyond the $nF-name basis"))
    }
    def nTrees: Int = trees.length
  }

  /** Training knobs — rfModel.py's configObj surface (`n_estimators`,
    * `max_depth`) plus MLlib's determinism seed. `maxDepth = 0` maps
    * the reference's `max_depth: None` onto MLlib's ceiling (30). */
  case class Config(
      numTrees: Int = 100,
      maxDepth: Int = 8,
      seed: Long = 42L)

  // --------------------------------------------------------------- forward

  /** One tree's vote for feature vector `x` — compare-and-descend,
    * O(depth), no arithmetic. */
  def eval(t: Tree, x: Array[Double]): Double = {
    var i = 0
    while (t.feature(i) >= 0) {
      i = if (x(t.feature(i)) <= t.threshold(i)) t.left(i) else t.right(i)
    }
    t.vote(i)
  }

  /** Forest probability: mean of tree votes, accumulated in tree order
    * (the one place forest scoring touches float arithmetic; the ml8
    * gate keeps votes integer so even this sum is exact). */
  def forward(m: ForestModel, x: Array[Double]): Double = {
    var s = 0.0
    var t = 0
    while (t < m.trees.length) { s += eval(m.trees(t), x); t += 1 }
    s / m.nTrees
  }

  /** One tree as a Catalyst comparison ladder over the feature columns
    * (in [[ForestModel.featureNames]] order) — nested `when`/
    * `otherwise` built by descending the node arrays, so the EXPRESSION
    * TREE mirrors the decision tree and whole-stage codegen compiles it
    * to branches. */
  def treeCol(t: Tree, feats: Seq[Column]): Column = {
    def node(i: Int): Column =
      if (t.feature(i) < 0) lit(t.vote(i))
      else when(feats(t.feature(i)) <= lit(t.threshold(i)), node(t.left(i)))
        .otherwise(node(t.right(i)))
    node(0)
  }

  /** The forest's raw vote SUM as a column (tree-order left-associated
    * adds — [[forward]]'s twin, and the integer-exact ml8 gate value). */
  def voteSumCol(m: ForestModel, feats: Seq[Column]): Column = {
    require(feats.size == m.featureNames.size,
      s"${feats.size} feature columns for a ${m.featureNames.size}-feature forest")
    m.trees.map(treeCol(_, feats)).reduceLeft(_ + _)
  }

  /** Batch scoring: forest probability (mean vote) as one codegen'd
    * column — no UDF, no model object at execution time. */
  def scoreCol(m: ForestModel, feats: Seq[Column]): Column =
    voteSumCol(m, feats) / lit(m.nTrees.toDouble)

  // -------------------------------------------------------------- training

  /** Distributed forest training through the [[Trainer]] seam: an
    * assembled (label, features [, weightCol]) frame in, the MLlib
    * model out. `weightCol` carries the reference's classWeights /
    * subtype-sampler knob ([[Trainer.subtypeWeightCol]] /
    * [[Trainer.withSamplerWeights]] produce it — sklearn's
    * `class_weight` dict is exactly a per-row weight keyed on the
    * label, so the M13 column IS the classWeights integration). */
  def train(assembled: DataFrame, cfg: Config = Config(),
            weightCol: Option[String] = None): RandomForestClassificationModel = {
    val rf = new RandomForestClassifier()
      .setNumTrees(cfg.numTrees)
      .setMaxDepth(if (cfg.maxDepth > 0) cfg.maxDepth else 30)
      .setSeed(cfg.seed)
    weightCol.foreach(rf.setWeightCol)
    rf.fit(assembled)
  }

  /** Flatten a trained MLlib forest to the engine-neutral arrays —
    * breadth-first node layout (children always forward references,
    * the [[Tree]] invariant). `featureNames` documents the basis the
    * model was assembled under and pins its width. */
  def fromMllib(m: RandomForestClassificationModel,
                featureNames: Seq[String]): ForestModel = {
    require(m.numClasses == 2,
      s"forest export is binary-classification semantics; got ${m.numClasses}")
    require(m.numFeatures == featureNames.size,
      s"model has ${m.numFeatures} features for ${featureNames.size} names")
    val trees = m.trees.map { dt =>
      val flat = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.ml.graft.TreeBridge.FlatNode]
      val index = scala.collection.mutable.Map
        .empty[org.apache.spark.ml.tree.Node, Int]
      val queue = scala.collection.mutable.Queue(dt.rootNode)
      while (queue.nonEmpty) {
        val n = queue.dequeue()
        index(n) = flat.size
        val f = org.apache.spark.ml.graft.TreeBridge.flatten(n)
        flat += f
        if (f.feature >= 0) { queue.enqueue(f.left); queue.enqueue(f.right) }
      }
      Tree(
        feature = flat.map(_.feature).toArray,
        threshold = flat.map(f =>
          if (f.feature >= 0) f.threshold else 0.0).toArray,
        left = flat.map(f => if (f.feature >= 0) index(f.left) else 0).toArray,
        right = flat.map(f => if (f.feature >= 0) index(f.right) else 0).toArray,
        vote = flat.map(f => if (f.feature >= 0) 0.0 else f.vote).toArray)
    }
    ForestModel(featureNames, trees.toArray)
  }
}
