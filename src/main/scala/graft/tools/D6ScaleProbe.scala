package graft.tools

import org.apache.spark.sql.SparkSession

/** SCALING.md probe for d6 duplicate-cluster resolution: times the full
  * d6 path (candidate pairs -> large-star/small-star components) and
  * prints the number of star rounds to the fixpoint — the evidence that
  * convergence grows O(log n), not O(diameter), across scale decades.
  *
  * `runMain graft.tools.D6ScaleProbe <sfDir> [reps]`
  */
object D6ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: D6ScaleProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runs = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      val pairs = graft.queries.TextQueries.d2NgramJaccard(spark, dir)
        .select("id_a", "id_b")
      val (comp, rounds) = graft.operators.Dedup.dupClustersWithRounds(pairs)
      val n = comp.count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[d6probe] rep $i: $dt%.3f s, $rounds rounds, $n labelled docs")
      (dt, rounds, n)
    }
    val best = runs.minBy(_._1)
    println(f"""{"dir":"$dir","min_sec":${best._1}%.3f,"rounds":${best._2},"docs":${best._3}}""")
    spark.stop()
  }
}
