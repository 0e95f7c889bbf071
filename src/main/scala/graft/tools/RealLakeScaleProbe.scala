package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** The one CLI composition with no SCALING row until round 19: the
  * REAL-lake `runseq` path — [[graft.Run]]'s nested-parquet lake mode,
  * i.e. `Tidy(read)` → the posexplode `nestedToFlatDps` lineage →
  * `pmod(xxhash64(id), k)` folds → the cfg1 skeleton frame. The
  * fixture/testdata mode inherits ml2/cfg1's decades; this lineage
  * differs (real explode + time-parse + string-hash folds instead of
  * the fixture's closed forms), so it gets its own decade measurement.
  *
  * `runMain graft.tools.RealLakeScaleProbe [sfDirs...]`
  * (default: /root/testdata/sf0.1 target/scale_sf1). For each corpus:
  * materialize the fixture's nested shape as an events.parquet lake
  * (one-off, timed separately — this is lake CONSTRUCTION, not the
  * probed path), then time the full `graft.Run runseq` tool twice and
  * report the min. The decade exponent is log10(t_big / t_small).
  */
object RealLakeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "target/scale_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the shipped nnConfig, as the CLI takes it (a real file path)
    val tmp = Files.createTempDirectory("reallake_probe_")
    val cfgPath = tmp.resolve("nnConfig.json")
    val in = getClass.getResourceAsStream("/osdb/nnConfig.json")
    require(in != null, "missing /osdb/nnConfig.json resource")
    try Files.write(cfgPath, in.readAllBytes()) finally in.close()

    val times = dirs.map { dir =>
      require(Files.isDirectory(Paths.get(dir)), s"missing corpus $dir")
      val lakeDir = tmp.resolve(s"lake_${Paths.get(dir).getFileName}")
      Files.createDirectories(lakeDir)
      val t0 = System.nanoTime()
      graft.queries.OsdbFixture.nested(spark, dir)
        .write.mode("overwrite")
        .parquet(lakeDir.resolve("events.parquet").toString)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val reps = (1 to 2).map { r =>
        spark.sharedState.cacheManager.clearCache()
        val out = tmp.resolve(s"out_${Paths.get(dir).getFileName}_$r")
        val t1 = System.nanoTime()
        val n = graft.Run.run(spark, graft.Run.Args(
          "runseq", cfgPath.toString, lakeDir.toString, out.toString,
          kfold = 3))
        val t = (System.nanoTime() - t1) / 1e9
        println(f"[reallake] $dir rep$r runseq $t%.2f s ($n skeleton rows)")
        t
      }
      println(f"[reallake] $dir lake-build $tBuild%.2f s, runseq min ${reps.min}%.2f s")
      dir -> reps.min
    }
    if (times.length >= 2) {
      val decade = math.log10(times.last._2 / times.head._2)
      println(f"[reallake] decade exponent ${times.head._1} -> " +
        f"${times.last._1}: $decade%.2f")
    }
    spark.stop()
  }
}
