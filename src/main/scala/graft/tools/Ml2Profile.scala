package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{FeatureExtract, FeatureHistory, Flatten}
import graft.functions.EpochFeatures
import graft.queries.{Exact, OsdbFixture}

/** r19 optimization-round probe: WHERE does the ml2/cfg1/ml9 composed
  * lineage spend its time at sf0.1? Stages are cumulative prefixes of
  * the real pipeline (each timed by its own toRdd.count, min-of-reps):
  *
  *   fixture   — OsdbFixture.flatDps (event scan + array UDFs, no
  *               shuffle)
  *   extract   — + the per-event shuffle and the fused P14+P12 kernel
  *               (EpochRow with the features MAP column)
  *   flatcols  — + the 144 element_at(features, name) projections
  *               (RunSequence.flatEpochs's output shape)
  *   history   — + the W7 lag-history window
  *   ml2       — the full declared query (skeleton aggregates + eager
  *               fold-range/persist actions)
  *
  * Plus A/B arms for the candidate r19 changes, same action, same
  * session:
  *
  *   extract_stubraw — extract with rawData replaced by a presence
  *               stub BEFORE the groupByKey shuffle (the kernel reads
  *               rawData3D content but only rawData PRESENCE — guide
  *               §2.3 shuffle-fewer-bytes)
  *   fixture_codegen — flatDps's array UDFs restated as
  *               transform(sequence()) codegen expressions (guide §4:
  *               built-ins over closures)
  *
  * `runMain graft.tools.Ml2Profile <sfDir> [reps]`
  */
object Ml2Profile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(df: => DataFrame): Double = {
      val runs = (1 to reps).map { i =>
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[ml2prof] $tag rep $i: $dt%.2f s ($n rows)")
        dt
      }
      val m = runs.min
      println(f"$tag%-18s $m%7.3f s")
      m
    }

    val where = col("k") % 3 =!= 2 && col("u") % 2 === 0
    def events() = OsdbFixture.ev(spark, dir).select(
      col("e").as("id"), col("u"),
      col("type_str").as("type"), col("sub_type").as("subType"))
    def dps() = OsdbFixture.flatDps(spark, dir, where = where)
    def ev() = graft.ml.RunSequence.selectedEvents(events(),
      col("type") =!= "Unknown" && col("u") % 2 === 0,
      Exact.knuthHash32(col("id")) % 3)
    val cfg = graft.ml.RunSequence.Config()

    time("fixture")(dps().toDF())

    time("extract") {
      val sel = dps()
      FeatureExtract.extract(sel, cfg.extract, validate = true).toDF()
    }

    // A/B: presence-stub rawData before the shuffle (content unused)
    time("extract_stubraw") {
      val spark2 = spark
      import spark2.implicits._
      val sel = dps().toDF()
        .withColumn("rawData",
          when(size(col("rawData")) > 0, array(lit(1.0)))
            .otherwise(col("rawData")))
        .as[Flatten.FlatDp]
      FeatureExtract.extract(sel, cfg.extract, validate = true).toDF()
    }

    time("flatcols") {
      graft.ml.RunSequence.flatEpochs(ev(), dps(), cfg.extract)
    }

    // A/B: flatcols with POSITIONAL map access (element_at(map_values, i)
    // + key guard) instead of the O(|map|) per-name element_at scan
    time("flatcols_pos") {
      val sel0 = dps()
      val sel = sel0.join(ev().select(col("srcId")),
          sel0("eventId") === col("srcId"), "left_semi")
        .as[Flatten.FlatDp](sel0.encoder)
      val epochs = FeatureExtract.extract(sel, cfg.extract, validate = true)
      val order = EpochFeatures.epochFeatures(
        Array(0.0), Array(0.0), Array(0.0), 25.0).keys.toVector
      val names = EpochFeatures.FeatureNames
      val ks = map_keys(col("features"))
      val vs = map_values(col("features"))
      val featCols = names.map { nm =>
        val i = order.indexOf(nm) + 1
        when(try_element_at(ks, lit(i)) === nm, try_element_at(vs, lit(i)))
          .otherwise(raise_error(lit(s"epoch features missing '$nm'")))
          .as(nm)
      }
      epochs.toDF().select(
        Seq(col("eventId"), col("type"), col("tsSec"),
          col("startSample")) ++ featCols: _*)
    }

    // A/B: flatcols minus the feature projections (semi join + extract
    // only) — isolates the element_at cost from the join cost
    time("flatcols_nofeat") {
      val sel0 = dps()
      val sel = sel0.join(ev().select(col("srcId")),
          sel0("eventId") === col("srcId"), "left_semi")
        .as[Flatten.FlatDp](sel0.encoder)
      FeatureExtract.extract(sel, cfg.extract, validate = true).toDF()
        .select(col("eventId"), col("type"), col("tsSec"),
          col("startSample"))
    }

    time("history") {
      FeatureHistory.addHistory(
        graft.ml.RunSequence.flatEpochs(ev(), dps(), cfg.extract),
        EpochFeatures.FeatureNames, cfg.historyN)
    }

    time("ml2") {
      graft.ml.RunSequence.skeleton(events(), dps(),
        select = col("type") =!= "Unknown" && col("u") % 2 === 0,
        foldOf = Exact.knuthHash32(col("id")) % 3)
    }

    // A/B: fixture arrays from codegen transform(sequence()) instead of
    // Scala UDFs — identical integer arithmetic, same values
    time("fixture_codegen") {
      val base = OsdbFixture.ev(spark, dir)
        .withColumn("d", explode(expr("sequence(0L, n_dp - 1)")))
        .withColumn("ts", lit(OsdbFixture.TsBase) + col("k") * 3600 + col("d") * 5)
        .withColumn("hr",
          when((col("k") + col("d")) % 4 < col("k") % 5, -1.0)
            .otherwise((lit(60L) + (col("k") + col("d") * 7) % 60).cast("double")))
        .withColumn("o2",
          when((col("k") * 2 + col("d")) % 6 < col("k") % 7, -1.0)
            .otherwise((lit(90L) + (col("k") + col("d")) % 10).cast("double")))
        .withColumn("alarm",
          when((col("k") + col("d")) % 9 < 4, (col("k") + col("d")) % 9)
            .otherwise(0L))
        .withColumn("has_raw", (col("k") + col("d")) % 7 =!= 0)
        .withColumn("has_3d", col("k") % 4 =!= 1)
        .filter(where)
        .withColumn("rawData",
          when(col("has_raw"), expr(
            "transform(sequence(0, 124), i -> cast(" +
              "if((k + d) % 11 = 0, 1000 + i % 2, " +
              "800 + (k*104729 + d*257 + i*23) % 401) as double))")))
        .withColumn("rawData3D",
          when(col("has_3d"), expr(
            "transform(sequence(0, 374), j -> cast(" +
              "((k*7919 + d*131 + (j div 3)*17 + (j % 3)*29) % 2001) - 1000" +
              " as double))")))
      base.select(
        col("e").cast("string").as("eventId"),
        col("u").cast("string").as("userId"),
        col("type_str").as("typeStr"),
        col("label").as("type"),
        col("ts").as("tsSec"),
        col("alarm").as("osdAlarmState"),
        lit(0.0).as("osdSpecPower"),
        lit(0.0).as("osdRoiPower"),
        col("hr"),
        col("o2").as("o2sat"),
        coalesce(col("rawData"), array().cast("array<double>")).as("rawData"),
        coalesce(col("rawData3D"), array().cast("array<double>")).as("rawData3D"),
        lit(false).as("synthetic"),
        col("d").as("seq"))
    }

    spark.stop()
  }
}
