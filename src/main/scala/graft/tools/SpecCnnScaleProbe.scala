package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml.SpecCnn

/** Spectrogram-CNN cost-shape probe: the scale claims
  * [[graft.ml.SpecCnn]]'s docblock asserts, measured —
  *
  *   1. EXTRACTION ([[SpecCnn.specImage]] over the window column, the
  *      assembledSpecBase map) is embarrassingly parallel per window:
  *      O(nSpec·specSamp²) direct-DFT flops each, decade exponent ≈ 1.
  *   2. BATCH SCORING via [[SpecCnn.logitCol]] is one codegen'd
  *      projection over the flattened image — rows/s + decade.
  *   3. TRAINING is one DetAgg gradient pass per LBFGS evaluation —
  *      ~linear in rows at fixed iterations.
  *
  * Windows are synthesized IN-PLAN (sin mixtures + LCG phase jitter,
  * separable classes, no driver materialization) at the DEFAULT basis
  * geometry (750-sample buffers → 25×29 images at specSamp 50 / step
  * 25), so the numbers speak for the shape `runNestedBases` actually
  * runs.
  *
  * `runMain graft.tools.SpecCnnScaleProbe [baseExtract] [baseTrain]`
  */
object SpecCnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseE = args.headOption.map(_.toLong).getOrElse(100000L)
    val baseT = args.lift(1).map(_.toLong).getOrElse(4000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val W = 750
    val cfg = SpecCnn.Config(channels = Seq(4, 8), maxIter = 10)
    val (nFreq, nSpec) = SpecCnn.imageDims(W, cfg.specSamp, cfg.specStep)
    System.err.println(s"[speccnn] geometry: $W samples -> $nFreq x $nSpec")

    def windows(n: Long): DataFrame =
      spark.range(n).select(
        col("id"),
        (col("id") % 2).cast("double").as("label"),
        transform(sequence(lit(0), lit(W - 1)), t => {
          val ph = pmod(col("id") * 2654435761L, lit(628)).cast("double") / 100.0
          lit(0.9) +
            lit(0.06) * sin(t.cast("double") / lit(8.0) + ph) +
            when(col("id") % 2 === 1,
              lit(0.08) * sin(t.cast("double") * lit(1.26) + ph))
              .otherwise(lit(0.0))
        }).as("window"))

    def images(src: DataFrame): DataFrame =
      src.select(col("id"), col("label"), col("window"))
        .as[(Long, Double, Array[Double])]
        .map { case (id, l, w) =>
          (id, l, SpecCnn.specImage(w, cfg.specSamp, cfg.specStep, cfg.zeroTol))
        }.toDF("id", "label", "spectrogram")

    // ---- 1. extraction decade (the assembledSpecBase map)
    images(windows(1000)).agg(count(lit(1))).collect() // warm JIT + codegen
    val eTimes = Seq(baseE, baseE * 10).map { n =>
      val src = windows(n).persist()
      src.count()
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        images(src).agg(sum(element_at(col("spectrogram"), 1))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      src.unpersist()
      System.err.println(
        f"[speccnn] extract n=$n%8d: ${reps.min}%6.2f s (${n / reps.min}%,.0f rows/s)")
      reps.min
    }
    System.err.println(
      f"[speccnn] extract decade exponent: ${math.log10(eTimes(1) / eTimes(0))}%.2f")

    // ---- 2. scoring decade over precomputed images
    val rnd = new scala.util.Random(7)
    var cIn = 1
    val layers = cfg.channels.map { cOut =>
      val l = SpecCnn.Layer(cIn, cOut,
        Array.fill(cOut * cIn * 9)(rnd.nextGaussian() * 0.3),
        Array.fill(cOut)(0.0))
      cIn = cOut
      l
    }.toArray
    val (hF, wF) = cfg.channels.indices.foldLeft((nFreq, nSpec))((dd, _) =>
      ((dd._1 + 1) / 2, (dd._2 + 1) / 2))
    val m = SpecCnn.SpecCnnModel(nFreq, nSpec, layers,
      Array.fill(cfg.channels.last * hF * wF)(rnd.nextGaussian() * 0.3),
      0.0, mean = 0.9, std = 0.1)
    val sTimes = Seq(baseE, baseE * 10).map { n =>
      val img = images(windows(n)).persist()
      img.count()
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        img.select(SpecCnn.logitCol(m, col("spectrogram")).as("z"))
          .agg(sum("z")).collect()
        (System.nanoTime() - t0) / 1e9
      }
      img.unpersist()
      System.err.println(
        f"[speccnn] score   n=$n%8d: ${reps.min}%6.2f s (${n / reps.min}%,.0f rows/s)")
      reps.min
    }
    System.err.println(
      f"[speccnn] score decade exponent: ${math.log10(sTimes(1) / sTimes(0))}%.2f")

    // ---- 3. training decade at fixed iterations
    SpecCnn.train(images(windows(500)), nFreq, nSpec, cfg.copy(maxIter = 3))
    val tTimes = Seq(baseT, baseT * 10).map { n =>
      val img = images(windows(n)).persist()
      img.count()
      val t0 = System.nanoTime()
      SpecCnn.train(img, nFreq, nSpec, cfg)
      val s = (System.nanoTime() - t0) / 1e9
      img.unpersist()
      System.err.println(
        f"[speccnn] train   n=$n%8d x ${cfg.maxIter} iters: $s%6.2f s")
      s
    }
    System.err.println(
      f"[speccnn] train decade exponent: ${math.log10(tTimes(1) / tTimes(0))}%.2f")
    spark.stop()
  }
}
