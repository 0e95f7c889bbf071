package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Densifying-skew probes for the two self-named risk points the
  * round-9 SCALING.md register left unmeasured (round-10 verdict item
  * #3). ScaleGen's fleet-growth shape adds users at constant density,
  * which never densifies a key; these probes synthesize the densifying
  * worst cases directly:
  *
  *   - g2 (triangleCounts): power-law degree graphs at fixed node count
  *     and growing edge count — the Σdeg² wedge blow-up that degree
  *     orientation exists to prevent — plus an extreme hub (star core)
  *     variant. Uniform graphs at the same |E| are the control.
  *   - lm1 (bigramLmScores): a Zipf-token corpus where the head word
  *     takes ~15% of all tokens (so the top bigram key carries ~2% of
  *     the corpus-scale scoring join) vs a uniform-token corpus of the
  *     same size.
  *
  * `runMain graft.tools.SkewProbe <g2|lm1> [reps]` — prints per-config
  * min seconds + the size facts needed to compute exponents.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewProbe <g2|lm1> [reps]")
    val mode = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(body: => Long): Double = {
      val runs = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val n = body
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[skew] $tag rep $i: $dt%.2f s ($n rows)")
        dt
      }
      runs.min
    }

    if (mode == "g2") {
      // node id = floor(N * r^expo): expo=1 uniform, expo=4 power-law
      // (hub mass near 0). Distinct undirected u<v edge list.
      def graph(nNodes: Long, nEdges: Long, expo: Double, seed: Int): DataFrame =
        spark.range(nEdges).select(
            (pow(rand(seed), expo) * nNodes).cast("long").as("a"),
            (pow(rand(seed + 1), expo) * nNodes).cast("long").as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("u"),
            greatest(col("a"), col("b")).as("v"))
          .distinct()
      // star core: 5 hubs each touching every node (degree ~ N) on top
      // of a sparse uniform background — the orientation acid test
      def starGraph(nNodes: Long, seed: Int): DataFrame =
        graph(nNodes, nNodes, 1.0, seed)
          .union(spark.range(5).select(col("id").as("u"))
            .crossJoin(spark.range(nNodes).select(col("id").as("v")))
            .filter(col("u") < col("v")))
          .select(least(col("u"), col("v")).as("u"),
            greatest(col("u"), col("v")).as("v"))
          .distinct()

      val configs = Seq(
        ("uniform-1x", graph(20000L, 200000L, 1.0, 11)),
        ("uniform-10x", graph(20000L, 2000000L, 1.0, 13)),
        ("powerlaw-1x", graph(20000L, 200000L, 4.0, 17)),
        ("powerlaw-10x", graph(20000L, 2000000L, 4.0, 19)),
        ("star-20k", starGraph(20000L, 23)),
        ("star-200k", starGraph(200000L, 29)))
      configs.foreach { case (tag, g) =>
        val edges = g.persist()
        val m = edges.count()
        val maxDeg = edges.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy("x").count().agg(max("count")).head().getLong(0)
        System.err.println(s"[skew] $tag: |E|=$m maxDeg=$maxDeg")
        time(tag) {
          val r = graft.operators.Graph.triangleCounts(edges)
            .agg(coalesce(sum("triangles"), lit(0L)).as("t"),
              count(lit(1)).as("n")).head()
          r.getLong(0)
        }
        edges.unpersist()
        spark.sharedState.cacheManager.clearCache()
      }
    } else if (mode == "lm1") {
      // word id = floor(V * r^expo) over V=2000: expo=1 uniform,
      // expo=4 Zipf-ish (head word ~15% of tokens)
      def corpus(nDocs: Long, wordsPerDoc: Int, expo: Double, seed: Int): DataFrame =
        spark.range(nDocs * wordsPerDoc).select(
            (col("id") / wordsPerDoc).cast("long").as("doc_id"),
            concat(lit("w"),
              (pow(rand(seed), expo) * 2000).cast("long")).as("w"))
          .groupBy("doc_id")
          .agg(concat_ws(" ", collect_list(col("w"))).as("text"))
      val configs = Seq(
        ("uniform-1x", corpus(5000L, 200, 1.0, 31)),
        ("uniform-10x", corpus(50000L, 200, 1.0, 37)),
        ("zipf-1x", corpus(5000L, 200, 4.0, 41)),
        ("zipf-10x", corpus(50000L, 200, 4.0, 43)),
        // expo=8: head word ~39% of tokens, top bigram ~15% of the
        // corpus-scale join's left side — the stopword worst case
        ("heavy-10x", corpus(50000L, 200, 8.0, 47)))
      // three join regimes: default (model auto-broadcasts when it
      // fits — the local shape), and broadcast-disabled (the 100 TB
      // shape where c2 exceeds driver/broadcast budgets and the
      // scoring join is a (w1,w2)-shuffled SMJ) with AQE skew-join
      // on vs off
      val regimes = Seq(
        ("default", () => {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L << 20)
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        }),
        ("smj+skewfix", () => {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
          // local partitions are far below the 256 MB absolute floor;
          // lower it so the splitter actually fires like it would on
          // cluster-sized partitions
          spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
          spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
        }),
        ("smj-noskewfix", () => {
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1L)
          spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        }))
      configs.foreach { case (tag, c) =>
        val docs = c.persist()
        val n = docs.count()
        System.err.println(s"[skew] $tag: docs=$n")
        regimes.foreach { case (rtag, set) =>
          set()
          time(s"$tag/$rtag") {
            graft.operators.TextAnalysis
              .bigramLmScores(docs, "doc_id", "text")
              .agg(sum("novel_bigrams"), max("avg_p")).head()
            n
          }
        }
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L << 20)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        docs.unpersist()
        spark.sharedState.cacheManager.clearCache()
      }
    } else sys.error(s"unknown mode $mode")
    spark.stop()
  }
}
