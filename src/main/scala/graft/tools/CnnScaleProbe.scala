package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.Cnn

/** CNN cost-shape probe: the two scale claims [[graft.ml.Cnn]]'s
  * docblock asserts, measured —
  *
  *   1. TRAINING is one treeAggregate gradient pass per LBFGS
  *      evaluation, so total cost should scale ~linearly in rows at
  *      fixed iterations (decade exponent ≈ 1 once data dominates job
  *      overhead) with driver state only the parameter vector.
  *   2. BATCH SCORING via [[Cnn.logitCol]] stays inside whole-stage
  *      codegen; measure rows/s against the same model applied through
  *      a Scala-UDF twin of [[Cnn.forward]] (the path the design
  *      rejected) on identical data.
  *
  * Windows are synthesized IN-PLAN (sin mixtures + deterministic
  * LCG jitter, no driver materialization) so the probe scales to any
  * row count.
  *
  * `runMain graft.tools.CnnScaleProbe [baseRows]`
  */
object CnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(4000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val W = 125
    // label = id % 2; class-1 rows add a 5 Hz burst over the shared
    // 0.5 Hz sway + per-row LCG phase jitter — separable but noisy
    def windows(n: Long): DataFrame =
      spark.range(n).select(
        col("id"),
        (col("id") % 2).cast("double").as("label"),
        transform(sequence(lit(0), lit(W - 1)), t => {
          val ph = pmod(col("id") * 2654435761L, lit(628)).cast("double") / 100.0
          lit(900.0) +
            lit(60.0) * sin(t.cast("double") / lit(8.0) + ph) +
            when(col("id") % 2 === 1,
              lit(80.0) * sin(t.cast("double") * lit(1.26) + ph))
              .otherwise(lit(0.0))
        }).as("window"))

    // ---- 1. training decade exponent at fixed iterations
    // (warmup first: the cold run pays Janino + JIT for the whole
    // treeAggregate path and lands on the small size otherwise)
    val iters = 15
    Cnn.train(windows(500), Cnn.Config(maxIter = 3))
    val times = Seq(base.toLong, base * 10L).map { n =>
      val df = windows(n).persist()
      df.count()
      val t0 = System.nanoTime()
      Cnn.train(df, Cnn.Config(maxIter = iters))
      val s = (System.nanoTime() - t0) / 1e9
      df.unpersist()
      System.err.println(f"[cnn] train n=$n%7d maxIter=$iters: $s%7.2f s")
      s
    }
    System.err.println(
      f"[cnn] training decade exponent: ${math.log10(times(1) / times(0))}%.2f")

    // ---- 2. scoring: codegen column vs Scala-UDF forward, same model
    val m = {
      val rnd = new scala.util.Random(11)
      Cnn.CnnModel(4, 9, W,
        filters = Array.fill(36)(rnd.nextGaussian()),
        filterBias = Array.fill(4)(rnd.nextGaussian() * 0.1),
        dense = Array.fill(4)(rnd.nextGaussian()),
        bias = 0.1, mean = 900.0, std = 80.0)
    }
    val scoreRows = base * 25L
    val sdf = windows(scoreRows).persist()
    sdf.count()
    def time2(what: String)(mk: => DataFrame): Double = {
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        // aggregate over the logit so Catalyst cannot prune the compute
        mk.agg(sum("z")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val s = reps.min
      System.err.println(
        f"[cnn] score/$what%-7s n=$scoreRows%8d: $s%6.2f s (${scoreRows / s}%,.0f rows/s)")
      s
    }
    val tNative = time2("native") {
      sdf.select(Cnn.logitCol(m, col("window")).as("z"))
    }
    val fwdUdf = udf { (w: Seq[Double]) => Cnn.forward(m, w.toArray) }
    val tUdf = time2("udf") {
      sdf.select(fwdUdf(col("window")).as("z"))
    }
    // the composition the native expression replaced: transform +
    // array_max routes every conv position through ArrayTransform's
    // interpreted lambda dispatch (measure on a slice — it is slow)
    val hofRows = math.max(scoreRows / 25, 1L)
    val hdf = sdf.limit(hofRows.toInt).persist()
    hdf.count()
    def hofLogit(win: org.apache.spark.sql.Column) = {
      val scaled = (v: org.apache.spark.sql.Column) =>
        (v - lit(m.mean)) / lit(m.std)
      val nPos = size(win) - m.width + 1
      val pools = (0 until m.nFilters).map { f =>
        val conv = transform(sequence(lit(1), nPos), t =>
          (0 until m.width).foldLeft(
            lit(m.filterBias(f)): org.apache.spark.sql.Column) { (acc, j) =>
            acc + lit(m.filters(f * m.width + j)) *
              scaled(element_at(win, t + j))
          })
        greatest(lit(0.0), array_max(conv))
      }
      pools.zipWithIndex.foldLeft(
        lit(m.bias): org.apache.spark.sql.Column) { case (acc, (pf, f)) =>
        acc + lit(m.dense(f)) * pf
      }
    }
    val t0h = System.nanoTime()
    hdf.select(hofLogit(col("window")).as("z")).agg(sum("z")).collect()
    val tHof = (System.nanoTime() - t0h) / 1e9
    System.err.println(
      f"[cnn] score/hof     n=$hofRows%8d: $tHof%6.2f s (${hofRows / tHof}%,.0f rows/s)")
    hdf.unpersist()
    System.err.println(
      f"[cnn] native vs udf: ${tUdf / tNative}%.2fx; native vs hof (rows/s): " +
        f"${(scoreRows / tNative) / (hofRows / tHof)}%.0fx")

    // ---- 3. the recurrent twin (graft.ml.Lstm): same two claims.
    // Scoring is O(T·H²) per row vs the CNN's O(nf·L·w) — at H=4 and
    // T=125 comparable flops, so rows/s should land in the same decade.
    import graft.ml.Lstm
    val lm = {
      val rnd = new scala.util.Random(13)
      val h = 4
      Lstm.LstmModel(h, W,
        wx = Array.fill(4 * h)(rnd.nextGaussian() * 0.5),
        wh = Array.fill(4 * h * h)(rnd.nextGaussian() * 0.3),
        b = Array.fill(4 * h)(rnd.nextGaussian() * 0.2),
        dense = Array.fill(h)(rnd.nextGaussian()),
        bias = 0.1, mean = 900.0, std = 80.0)
    }
    def timeL(what: String)(mk: => DataFrame): Double = {
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.agg(sum("z")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      val s = reps.min
      System.err.println(
        f"[lstm] score/$what%-7s n=$scoreRows%8d: $s%6.2f s (${scoreRows / s}%,.0f rows/s)")
      s
    }
    val tLNative = timeL("native") {
      sdf.select(Lstm.logitCol(lm, col("window")).as("z"))
    }
    val lstmUdf = udf { (w: Seq[Double]) => Lstm.forward(lm, w.toArray) }
    val tLUdf = timeL("udf") {
      sdf.select(lstmUdf(col("window")).as("z"))
    }
    System.err.println(f"[lstm] native vs udf: ${tLUdf / tLNative}%.2fx")
    Lstm.train(windows(500), Lstm.Config(maxIter = 3)) // warmup
    val ltimes = Seq(base.toLong, base * 10L).map { n =>
      val df = windows(n).persist()
      df.count()
      val t0 = System.nanoTime()
      Lstm.train(df, Lstm.Config(nUnits = 4, maxIter = iters))
      val s = (System.nanoTime() - t0) / 1e9
      df.unpersist()
      System.err.println(f"[lstm] train n=$n%7d maxIter=$iters: $s%7.2f s")
      s
    }
    System.err.println(
      f"[lstm] training decade exponent: ${math.log10(ltimes(1) / ltimes(0))}%.2f")

    sdf.unpersist()
    spark.stop()
  }
}
