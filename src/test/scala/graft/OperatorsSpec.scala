package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.operators.Flatten.FlatDp

class OperatorsSpec extends SparkSpec {

  private def flat(id: String, t: Long, raw: Array[Double] = Array.fill(125)(1.0),
                   xyz: Array[Double] = Array.emptyDoubleArray,
                   typ: Int = 1, hr: Double = 70.0): FlatDp =
    FlatDp(id, "u1", "Seizure/Tonic-Clonic", typ, t, 0L, 0.0, 0.0, hr, 98.0,
      raw, xyz, synthetic = false)

  test("type2id label encoding (C4)") {
    assert(Flatten.type2id("Seizure") == 1)
    assert(Flatten.type2id("seizure") == 1)
    assert(Flatten.type2id("False Alarm") == 0)
    assert(Flatten.type2id("NDA") == 0)
    assert(Flatten.type2id("Fall") == 2)
    assert(Flatten.type2id(null) == 2)
  }

  test("validateAndFill: gaps get zero datapoints, overlaps are dropped (P14)") {
    import spark.implicits._
    // dps end at t=5,10, then a 10s hole, then t=30; plus an overlap at t=31
    val dps = Seq(
      flat("E", 5), flat("E", 10), flat("E", 30), flat("E", 31)).toDS()
    val out = Flatten.validateAndFill(dps).collect().sortBy(_.tsSec)
    // gap between end=10 and start=25 is 15000ms > 2000 => 3 zero dps at 15,20,25
    assert(out.count(_.synthetic) == 3)
    assert(out.filter(_.synthetic).map(_.tsSec).toSeq == Seq(15L, 20L, 25L))
    assert(out.filter(_.synthetic).forall(d => d.rawData.forall(_ == 0.0) && d.hr == -1.0))
    // the t=31 dp overlaps (start 26 < last end 30 - tol) => dropped
    assert(!out.exists(_.tsSec == 31L))
    assert(out.length == 3 + 3)
  }

  test("validateAndFill keeps in-tolerance jitter and skips acc-less dps (F9)") {
    import spark.implicits._
    val dps = Seq(
      flat("E", 5), flat("E", 11),                       // 1s late: within 2s tol
      flat("E", 16, raw = Array.emptyDoubleArray)).toDS() // no accel: skipped
    val out = Flatten.validateAndFill(dps).collect()
    assert(out.length == 2 && out.forall(!_.synthetic))
  }

  test("EventFilters: include OR-union, exclude subtraction, substring match (F5/F6)") {
    import spark.implicits._
    val df = Seq(
      ("1", "u1", "Seizure", "Tonic-Clonic", "big shake", "phone", true, true, true),
      ("2", "u2", "False Alarm", "", "test event", "phone", true, false, true),
      ("3", "u3", "Seizure", "Absence", "quiet", "watch", false, true, true),
      ("4", "u4", "Fall", "", "fell over", "phone", true, true, true))
      .toDF("id", "userId", "type", "subType", "desc", "dataSourceName",
        "has3dData", "hasHrData", "hasO2SatData")

    // include seizures OR desc containing "fell"; exclude anything "test"
    val cfg = EventFilterConfig(
      includeTypes = Seq("seizure"), includeText = Seq("FELL"),
      excludeText = Seq("test"))
    val ids = df.filter(EventFilters.compile(cfg)).select("id")
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("1", "3", "4"))

    // require flags narrow further
    val cfg2 = cfg.copy(require3dData = true)
    val ids2 = df.filter(EventFilters.compile(cfg2)).select("id")
      .collect().map(_.getString(0)).toSet
    assert(ids2 == Set("1", "4"))

    // invalid-id removal (F4); empty includes = match all
    val cfg3 = EventFilterConfig(invalidIds = Seq("2", "3"))
    val ids3 = df.filter(EventFilters.compile(cfg3)).select("id")
      .collect().map(_.getString(0)).toSet
    assert(ids3 == Set("1", "4"))
  }

  test("Splits: deterministic, complete, disjoint, roughly stratified (M1/M2)") {
    import spark.implicits._
    val df = (1 to 2000).map(i => (i.toString, if (i % 4 == 0) "seizure" else "fa"))
      .toDF("id", "label")
    val s1 = Splits.hashSplit(df, "id", 0.8).cache()
    val frac = s1.filter(col("split") === "train").count().toDouble / 2000
    assert(math.abs(frac - 0.8) < 0.05)
    // deterministic: same seed, same assignment
    val s2 = Splits.hashSplit(df, "id", 0.8)
    assert(s1.select("id", "split").except(s2.select("id", "split")).count() == 0)
    // stratification: train fraction within each label also ~0.8
    val byLabel = s1.groupBy("label")
      .agg(avg(when(col("split") === "train", 1.0).otherwise(0.0)).as("f"))
      .collect().map(_.getDouble(1))
    byLabel.foreach(f => assert(math.abs(f - 0.8) < 0.08))
    // k-fold: every fold used, sizes balanced-ish, folds partition the data
    val kf = Splits.kFold(df, "id", 5).cache()
    val sizes = kf.groupBy("fold").count().collect().map(_.getLong(1))
    assert(sizes.length == 5 && sizes.sum == 2000)
    assert(sizes.min > 300 && sizes.max < 500)
  }

  test("Splits.stratifiedExactK equals the brute-force bottom-k (M10)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 3 strata: two large, one SMALLER than k (keep-all path); hash is
    // the same knuth multiply the query layer uses.
    val df = ((1 to 400).map(i => (i.toLong, "a")) ++
      (401 to 800).map(i => (i.toLong, "b")) ++
      (801L to 803L).map(i => (i, "tiny"))).toDF("id", "g")
    val h = (col("id") * lit(2654435761L)) % lit(4294967296L)
    val got = Splits.stratifiedExactK(df, "g", h, col("id"), k = 7)
      .select("g", "id").as[(String, Long)].collect().toSet
    val want = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(h.asc, col("id").asc)))
      .filter(col("rn") <= 7)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(got == want)
    assert(got.count(_._1 == "a") == 7 && got.count(_._1 == "b") == 7)
    assert(got.count(_._1 == "tiny") == 3) // stratum smaller than k: all kept
    // few buckets => the boundary-rank path does real work (phase-2
    // rank must trim inside a crowded boundary bucket)
    val coarse = Splits.stratifiedExactK(df, "g", h, col("id"), k = 7,
      buckets = 4).select("g", "id").as[(String, Long)].collect().toSet
    assert(coarse == want)
    // k = 1 degenerate: the single min per stratum
    val k1 = Splits.stratifiedExactK(df, "g", h, col("id"), k = 1)
    assert(k1.count() == 3)
    // massive hash collisions (h = id % 3): the boundary bucket holds
    // many equal hashes and the tie column must decide the exact cut
    val hColl = col("id") % 3
    val gotColl = Splits.stratifiedExactK(df, "g", hColl, col("id"), k = 7,
        hashMax = 3L, buckets = 3)
      .select("g", "id").as[(String, Long)].collect().toSet
    val wantColl = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(hColl.asc, col("id").asc)))
      .filter(col("rn") <= 7)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(gotColl == wantColl)
  }

  test("FeatureHistory adds t-k lags and mean, drops incomplete rows (W7)") {
    import spark.implicits._
    val df = Seq(
      ("E", 0L, 0, 1.0), ("E", 5L, 125, 2.0), ("E", 10L, 250, 3.0),
      ("F", 0L, 0, 10.0))
      .toDF("eventId", "tsSec", "startSample", "f1")
    val out = FeatureHistory.addHistory(df, Seq("f1"), n = 2)
    val rows = out.select("eventId", "tsSec", "f1_t-0", "f1_t-1", "f1_mean")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // E loses its first row; F (single row) disappears entirely
    assert(rows.toSet == Set(("E", 5L, 2.0, 1.0, 1.5), ("E", 10L, 3.0, 2.0, 2.5)))
  }

  test("FeatureExtract: epochs per event, HR interpolated, 3 Hz sine lights seizure_main (W5/P12/P13)") {
    import spark.implicits._
    val xyz = Array.tabulate(375) { j =>
      val i = j / 3
      if (j % 3 == 0) 50 * math.sin(2 * math.Pi * 3.0 * i / 25.0) else 0.0
    }
    val dps = Seq(
      flat("E", 5, xyz = xyz, hr = 60), flat("E", 10, xyz = xyz, hr = 80)).toDS()
    val rows = FeatureExtract.extract(dps,
        FeatureExtract.Config(window = 125, step = 125, highPassHz = 0.5))
      .collect().sortBy(_.startSample)
    assert(rows.length == 2)
    assert(rows(0).features("total_power_x_seizure_main") >
      100 * rows(0).features("total_power_x_8-10Hz"))
    // hr at the last sample of epoch 1 is the first anchor -> 60; epoch 2 -> 80
    assert(math.abs(rows(0).hr - 60.0) < 1e-9)
    assert(math.abs(rows(1).hr - 80.0) < 1e-9)
    // overlapping epochs: step 25 gives (250-125)/25+1 = 6 epochs
    val overlapping = FeatureExtract.extract(dps,
      FeatureExtract.Config(window = 125, step = 25)).collect()
    assert(overlapping.length == 6)
  }

  test("ScaleFeatures.minMaxScale maps to [0,1], constants to 0 (C16)") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (3.0, 5.0), (5.0, 5.0)).toDF("f1", "f2")
    val out = ScaleFeatures.minMaxScale(df, Seq("f1", "f2")).collect()
      .map(r => (r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0.0, 0.5, 1.0))
    assert(out.forall(_._2 == 0.0)) // constant column convention
  }

  test("Augment.oversample replicates with synthetic ids (M3/C17)") {
    import spark.implicits._
    val df = Seq(("1", "seizure"), ("2", "fa"), ("3", "seizure"))
      .toDF("id", "label")
    val out = Augment.oversample(df, "id", 3, col("label") === "seizure")
    assert(out.count() == 3 + 2 * 2)
    val ids = out.select("id").collect().map(_.getString(0)).toSet
    assert(ids.contains("1-1") && ids.contains("1-2") && ids.contains("3-2"))
    assert(out.select("id").distinct().count() == out.count()) // unique ids
  }

  test("Augment.userAugment tops every user up to the max count (M6)") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toString, "uA")) ++ (1 to 4).map(i => (s"b$i", "uB"))
    val out = Augment.userAugment(df.toDF("id", "userId"), "id", "userId")
    val counts = out.groupBy("userId").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("uA") == 10 && counts("uB") == 10)
    assert(out.select("id").distinct().count() == out.count())
  }

  test("Augment.noiseAugment is deterministic and recomputes magnitude (M4)") {
    import spark.implicits._
    val xyz = Array.fill(375)(100.0)
    val dps = Seq(flat("E", 5, xyz = xyz)).toDS()
    val a = Augment.noiseAugment(dps, factor = 2, sigmaMilliG = 5.0).collect()
    val b = Augment.noiseAugment(dps, factor = 2, sigmaMilliG = 5.0).collect()
    assert(a.length == 3)
    val aById = a.map(d => d.eventId -> d).toMap
    val bById = b.map(d => d.eventId -> d).toMap
    assert(aById.keySet == Set("E", "E-1", "E-2"))
    // determinism across runs
    assert(aById("E-1").rawData3D.sameElements(bById("E-1").rawData3D))
    // magnitude consistent with the noisy axes
    val d1 = aById("E-1")
    val m0 = math.sqrt((0 to 2).map(ax => math.pow(d1.rawData3D(ax), 2)).sum)
    assert(math.abs(d1.rawData(0) - m0) < 1e-9)
    // noise actually applied
    assert(!d1.rawData3D.sameElements(xyz))
  }

  test("Augment.phaseAugment emits shifted synthetic events (M5)") {
    import spark.implicits._
    val mag = Array.tabulate(250)(_.toDouble)
    val dps = Seq(
      flat("E", 5, raw = mag.slice(0, 125)),
      flat("E", 10, raw = mag.slice(125, 250))).toDS()
    val out = Augment.phaseAugment(dps, factor = 1).collect()
    val synth = out.filter(_.synthetic)
    assert(synth.nonEmpty && synth.forall(_.eventId == "E-p1"))
    // offset = 1*125/2 = 62 samples: first synthetic dp starts at sample 62
    assert(synth.minBy(_.tsSec).rawData(0) == 62.0)
  }

  test("Bloom.bloomSemiJoin: exact result, no false negatives, real pruning") {
    import spark.implicits._
    val large = (1L to 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = (1L to 50L).map(i => (i * 7L, i)).toDF("sk", "ord") // keys 7,14,...,350
    val got = Bloom.bloomSemiJoin(large, "k", small.select("sk"), "sk")
      .select("k").as[Long].collect().sorted
    val expect = (1L to 1000L).filter(k => k % 7 == 0 && k <= 350)
    assert(got.toSeq == expect, "bloom semi join must equal the exact semi join")

    // no false negatives by construction: every true key passes the probe
    val bf = Bloom.buildKeyFilter(small, "sk", 1000L, 65536L)
    val pass = large.filter(Bloom.mightContainKey(bf, col("k"))).count()
    assert(pass >= expect.size, "a true key failed the bloom probe")
    // and the probe actually prunes (fpp at 65536 bits / 50 keys is ~0)
    assert(pass < 200, s"bloom pruned nothing: $pass of 1000 rows passed")
  }

  test("Bloom.bloomSemiJoin: empty build side yields empty result") {
    import spark.implicits._
    val large = (1L to 10L).toDF("k")
    val small = Seq.empty[Long].toDF("sk")
    assert(Bloom.bloomSemiJoin(large, "k", small, "sk").count() == 0)
  }

  test("Bloom.bloomAntiJoin: exact anti semantics, same-named keys, empty corpus") {
    import spark.implicits._
    val batch = (1L to 1000L).toDF("k")
    val corpus = (1L to 1000L).filter(_ % 10 == 0).toDF("k") // 10% overlap
    val got = Bloom.bloomAntiJoin(batch, "k", corpus, "k")
      .as[Long].collect().sorted
    val expect = (1L to 1000L).filterNot(_ % 10 == 0)
    assert(got.toSeq == expect,
      "bloom anti join must equal the exact anti join (false positives removed)")
    // empty corpus: the whole batch is new
    assert(Bloom.bloomAntiJoin(batch, "k", Seq.empty[Long].toDF("k"), "k")
      .count() == 1000)
  }

  test("LakeMaintenance.compact: file sprawl collapses per partition, content identical") {
    import spark.implicits._
    import graft.sources.LakeMaintenance
    val base = java.nio.file.Files.createTempDirectory("lake3").toFile
    val src = new java.io.File(base, "src").getAbsolutePath
    val dst = new java.io.File(base, "dst").getAbsolutePath
    val df = (1L to 3000L).map(i => (i, s"p${i % 3}", i * 7 % 1000))
      .toDF("id", "part", "v")
    df.repartition(24).write.partitionBy("part").parquet(src)
    // sprawl fabricated: >= 20 files per partition dir
    LakeMaintenance.compact(spark, src, dst, "part", maxRecordsPerFile = 600)
    val stats = LakeMaintenance.compactionStats(spark, src, dst)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(stats.keySet == Set("part=p0", "part=p1", "part=p2"))
    stats.foreach { case (p, (before, after)) =>
      assert(before >= 20, s"$p: sprawl fixture degenerate ($before files)")
      // 1000 rows per partition at 600 records/file -> exactly 2 files
      assert(after == 2, s"$p: expected 2 compacted files, got $after")
    }
    // content unchanged, partition column re-derived from the dirs
    val a = spark.read.parquet(src).select("id", "part", "v")
      .collect().map(_.toSeq).toSet
    val b = spark.read.parquet(dst).select("id", "part", "v")
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 3000)
  }

  test("LakeMaintenance.deleteWhere: only matching partitions rewritten; empties vanish") {
    import spark.implicits._
    import graft.sources.LakeMaintenance
    val dir = java.nio.file.Files.createTempDirectory("lake5").toFile
      .getAbsolutePath + "/lake"
    // p0: partial match, p1: no match (must stay byte-identical),
    // p2: full match (directory must disappear entirely)
    val df = Seq(
      (1L, "p0", 10L), (2L, "p0", 99L), (3L, "p0", 99L),
      (4L, "p1", 10L), (5L, "p1", 11L),
      (6L, "p2", 99L), (7L, "p2", 99L)).toDF("id", "part", "v")
    df.write.partitionBy("part").parquet(dir)
    def listing(p: String): Seq[(String, Long)] = {
      val d = new java.io.File(dir, s"part=$p")
      if (!d.exists()) Seq.empty
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toSeq.sorted
    }
    val p1Before = listing("p1")
    val stats = LakeMaintenance.deleteWhere(spark, dir, "part",
        col("v") === 99L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("p0" -> 1L, "p2" -> 0L), s"got $stats")
    // untouched partition: same files, same mtimes — never rewritten
    assert(listing("p1") == p1Before && p1Before.nonEmpty)
    // fully-matched partition directory is gone
    assert(listing("p2").isEmpty &&
      !new java.io.File(dir, "part=p2").exists())
    val left = spark.read.parquet(dir).select("id", "part", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(left == Set((1L, "p0", 10L), (4L, "p1", 10L), (5L, "p1", 11L)))
    // no-match delete is a no-op returning empty stats
    assert(LakeMaintenance.deleteWhere(spark, dir, "part",
      col("v") === 12345L).count() == 0)
  }

  test("Pattern.sequencePattern: overlaps allowed, time bound enforced, keys isolated") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // u1: A B A B -> "A B" matches at rows 0 and 2 (overlap-friendly)
      (1L, ts(0), 10L, "A"), (1L, ts(10), 11L, "B"),
      (1L, ts(20), 12L, "A"), (1L, ts(30), 13L, "B"),
      // u1: a second "A B" whose B arrives too late for the 60 s bound
      (1L, ts(100), 14L, "A"), (1L, ts(200), 15L, "B"),
      // u2: an A..B pair split across keys must NOT match
      (2L, ts(5), 20L, "B"),
      // u3: same-timestamp rows ordered by the tie column
      (3L, ts(0), 31L, "A"), (3L, ts(0), 32L, "B")
    ).toDF("user_id", "ts", "event_id", "label")
    val m = graft.operators.Pattern.sequencePattern(ev, "user_id", "ts",
        "event_id", "label", Seq("A", "B"), withinSec = 60)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000))
      .sorted.toSeq
    assert(m == Seq((1L, 0L), (1L, 20L), (3L, 0L)))
    // single-label pattern degenerates to a filter (no lead, no bound):
    // all 5 B rows match regardless of the 1 s bound
    assert(graft.operators.Pattern.sequencePattern(ev, "user_id", "ts",
      "event_id", "label", Seq("B"), withinSec = 1).count() == 5)
  }

  test("LakeMaintenance.deleteWhere: NULL-predicate rows survive; emptying the lake returns stats") {
    import spark.implicits._
    import graft.sources.LakeMaintenance
    val dir = java.nio.file.Files.createTempDirectory("lake5n").toFile
      .getAbsolutePath + "/lake"
    // v=NULL row: `delete where v = 99` must not also forget it
    Seq((1L, "p0", Some(99L)), (2L, "p0", None), (3L, "p0", Some(10L)))
      .toDF("id", "part", "v")
      .write.partitionBy("part").parquet(dir)
    val stats = LakeMaintenance.deleteWhere(spark, dir, "part",
        col("v") === 99L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("p0" -> 2L), s"NULL-predicate row was deleted: $stats")
    assert(spark.read.parquet(dir).select("id").collect()
      .map(_.getLong(0)).toSet == Set(2L, 3L))
    // deleting everything empties the lake but still reports per
    // partition instead of throwing on the empty re-read
    val all = LakeMaintenance.deleteWhere(spark, dir, "part", lit(true))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all == Map("p0" -> 0L))
    assert(!new java.io.File(dir, "part=p0").exists())
  }

  test("LakeMaintenance.writeZOrdered: files are (a,b) boxes; second-dim predicates skip") {
    import spark.implicits._
    import graft.sources.LakeMaintenance
    val base = java.nio.file.Files.createTempDirectory("lake4").toFile
    // two independent uniform dims — the worst case for single-key sort
    val df = (0L until 4096L).map(i => (i, (i * 2654435761L) % 4096L))
      .toDF("a", "b")
    val zDir = new java.io.File(base, "z").getAbsolutePath
    val sDir = new java.io.File(base, "s").getAbsolutePath
    LakeMaintenance.writeZOrdered(df, zDir, col("a"), col("b"), numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(sDir) // the single-key baseline layout
    def hitFraction(dir: String, loB: Long, hiB: Long): Double = {
      val boxes = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("b").as("lo"), max("b").as("hi"))
        .collect()
      boxes.count(r => r.getLong(1) <= hiB && r.getLong(2) >= loB)
        .toDouble / boxes.length
    }
    // a b-band predicate covering 1/8 of the b range: the a-sorted
    // layout cannot skip (b is uniform within every file), the z-order
    // layout localizes b per file
    val (zHit, sHit) = (hitFraction(zDir, 0, 511), hitFraction(sDir, 0, 511))
    assert(sHit > 0.9, s"baseline unexpectedly skips ($sHit) — fixture broken")
    assert(zHit <= 0.5, s"z-order box localization lost: $zHit of files hit")
    // and the rewrite is content-exact
    assert(spark.read.parquet(zDir).select("a", "b").collect().map(_.toSeq).toSet
      == df.collect().map(_.toSeq).toSet)
  }

  test("lake versioning: snapshots are frozen, versions immutable, misses loud") {
    import spark.implicits._
    import graft.sources.LakeMaintenance._
    val dir = java.nio.file.Files.createTempDirectory("lakever").toString
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    commitVersion(spark, dir, v1, version = 1)
    // snapshot BEFORE the next commit...
    val before = readVersion(spark, dir, 1).collect().map(_.toSeq).toSet
    commitVersion(spark, dir, Seq((3L, "c")).toDF("id", "tag"),
      version = 2, carryFrom = Some(1))
    // ...and AFTER it: the v1 file set must be identical (time travel)
    val after = readVersion(spark, dir, 1).collect().map(_.toSeq).toSet
    assert(before == after && before == v1.collect().map(_.toSeq).toSet)
    assert(readVersion(spark, dir, 2).count() == 3)
    // versions are immutable: re-committing v1 fails loudly
    val e1 = intercept[IllegalArgumentException](
      commitVersion(spark, dir, v1, version = 1))
    assert(e1.getMessage.contains("immutable"))
    // reading an uncommitted version fails loudly, not empty
    val e2 = intercept[IllegalArgumentException](
      readVersion(spark, dir, 9))
    assert(e2.getMessage.contains("no committed manifest"))
    // crash recovery: an orphaned data dir with NO manifest (the
    // between-write-and-rename crash window) must not wedge the
    // version — the retry cleans it and commits
    val orphan = new java.io.File(dir, "data/v3")
    orphan.mkdirs()
    java.nio.file.Files.write(new java.io.File(orphan, "part-junk").toPath,
      "junk".getBytes("UTF-8"))
    commitVersion(spark, dir, Seq((9L, "z")).toDF("id", "tag"),
      version = 3, carryFrom = Some(2))
    assert(readVersion(spark, dir, 3).count() == 4)
  }

  test("versioned delete: affected files rewritten, carried files byte-identical, old version intact") {
    import spark.implicits._
    import graft.sources.LakeMaintenance._
    val dir = java.nio.file.Files.createTempDirectory("lakevdel").toString
    // two source files in v1 (repartition(2) by a value split so the
    // delete hits exactly one file's rows)
    val v1df = Seq((1L, "keep"), (2L, "keep"), (3L, "kill"), (4L, "kill"))
      .toDF("id", "tag").repartition(2, col("tag"))
    commitVersion(spark, dir, v1df, version = 1)

    def listing(rel: String): Map[String, Long] = {
      val d = new java.io.File(dir, rel)
      if (!d.isDirectory) Map.empty
      else d.listFiles().filter(_.isFile)
        .map(f => f.getName -> f.length()).toMap
    }
    val v1files = listing("data/v1")

    val stats = deleteWhereVersioned(spark, dir, fromVersion = 1,
        newVersion = 2, predicate = col("tag") === "kill")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(stats("rows_deleted") == 2L)
    assert(stats("files_rewritten") >= 1L)

    // new snapshot has only survivors; old snapshot is UNTOUCHED
    assert(readVersion(spark, dir, 2).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(readVersion(spark, dir, 1).count() == 4)
    assert(listing("data/v1") == v1files, "v1 files changed during the delete")

    // carried files are referenced BY NAME from v1's dir (no copy); and
    // if nothing matches, the commit is carry-only (no new data files)
    val m2 = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifests", "v2.list")), "UTF-8")
    if (stats("files_carried") > 0)
      assert(m2.contains("data/v1/"), "carried files not referenced in place")
    deleteWhereVersioned(spark, dir, 2, 3, col("tag") === "nomatch")
    assert(listing("data/v3").isEmpty, "no-match delete wrote data files")
    assert(readVersion(spark, dir, 3).count() == 2)

    // NULL predicate rows are KEPT (the deleteWhere contract)
    commitVersion(spark, dir,
      Seq((9L, null.asInstanceOf[String]), (10L, "kill"))
        .toDF("id", "tag"), version = 4)
    deleteWhereVersioned(spark, dir, 4, 5, col("tag") === "kill")
    assert(readVersion(spark, dir, 5).select("id").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))

    // the full lifecycle: vacuum retaining only the post-delete v2 —
    // v1's REWRITTEN (deleted-from) files are reclaimed, its CARRIED
    // files survive because v2 references them in place, and the
    // retained snapshot is unchanged
    val v2rows = readVersion(spark, dir, 2).collect().map(_.toSeq).toSet
    vacuum(spark, dir, Seq(2))
    assert(readVersion(spark, dir, 2).collect().map(_.toSeq).toSet == v2rows,
      "retained post-delete snapshot changed across vacuum")
    if (stats("files_carried") > 0)
      assert(listing("data/v1").nonEmpty,
        "vacuum reclaimed files the retained version still references")
    assert(listing("data/v1").size < v1files.size,
      "vacuum reclaimed nothing from the rewritten version")
  }

  test("lake vacuum: retained bytes identical, vacuumed reads loud, numbers burned") {
    import spark.implicits._
    import graft.sources.LakeMaintenance._
    val dir = java.nio.file.Files.createTempDirectory("lakevac").toString
    commitVersion(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), 1)
    commitVersion(spark, dir, Seq((3L, "c")).toDF("id", "tag"), 2,
      carryFrom = Some(1))
    commitVersion(spark, dir, Seq((4L, "d")).toDF("id", "tag"), 3)
    // plant an orphan from a "crashed commit" — vacuum must sweep it
    val orphan = new java.io.File(dir, "data/v7")
    orphan.mkdirs()
    java.nio.file.Files.write(new java.io.File(orphan, "part-junk").toPath,
      "junk".getBytes("UTF-8"))

    def byteListing(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(dir)
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.walk(root).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out(root.relativize(p).toString) = java.nio.file.Files.size(p)
      }
      out.toMap
    }
    val before = byteListing()
    val v2rows = readVersion(spark, dir, 2).collect().map(_.toSeq).toSet

    // retain only v2 (which carries v1's files): v3's data and v1's
    // manifest go; v1's FILES stay (v2 references them)
    val deleted = vacuum(spark, dir, Seq(2))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(deleted.exists(d => d._1 == "data_file" && d._2.startsWith("data/v3/")))
    assert(deleted.contains(("data_file", "data/v7/part-junk")), "orphan not swept")
    assert(deleted.contains(("manifest", "_manifests/v1.list")))
    assert(deleted.contains(("manifest", "_manifests/v3.list")))
    assert(!deleted.exists(_._2.startsWith("data/v1/")),
      "v1 files are carried by v2 — vacuum must keep them")

    // retained snapshot: byte-identical files, identical rows
    val after = byteListing()
    val keptBefore = before.filter(e => e._1.startsWith("data/v1/") ||
      e._1.startsWith("data/v2/") || e._1 == "_manifests/v2.list")
    assert(after.view.filterKeys(keptBefore.contains).toMap == keptBefore,
      "retained version's files changed across vacuum")
    assert(readVersion(spark, dir, 2).collect().map(_.toSeq).toSet == v2rows)

    // vacuumed/never-existed reads are loud and DISTINCT
    val e1 = intercept[IllegalArgumentException](readVersion(spark, dir, 3))
    assert(e1.getMessage.contains("was vacuumed"))
    val e2 = intercept[IllegalArgumentException](readVersion(spark, dir, 9))
    assert(e2.getMessage.contains("no committed manifest"))
    // a vacuumed version number is burned forever
    val e3 = intercept[IllegalArgumentException](
      commitVersion(spark, dir, Seq((5L, "e")).toDF("id", "tag"), 3))
    assert(e3.getMessage.contains("never reused"))
    // vacuuming a non-committed version is a loud mistake
    val e4 = intercept[IllegalArgumentException](vacuum(spark, dir, Seq(9)))
    assert(e4.getMessage.contains("not committed"))

    // empty-manifest snapshot: Spark 4's writer always emits at least
    // one schema-bearing file (even for a zero-partition frame — pinned
    // by this very test failing the other way first), so a file-less
    // manifest can only be hand-made/corrupt; the read must name the
    // condition, not throw a parquet path/schema error
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", "v4.list"),
      "#files=0\n".getBytes("UTF-8"))
    val e5 = intercept[IllegalArgumentException](readVersion(spark, dir, 4))
    assert(e5.getMessage.contains("empty snapshot"))
  }

  test("lake commit: create-exclusive race loses loudly; partial manifests rejected; half-vacuum heals") {
    import spark.implicits._
    import graft.sources.LakeMaintenance._
    val dir = java.nio.file.Files.createTempDirectory("lakerace").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mDir = new org.apache.hadoop.fs.Path(dir, "_manifests")

    // two committers of the SAME version: the second create-exclusive
    // publish fails loudly — one winner, one loser, never a silent
    // manifest replacement (the old tmp+rename form's race)
    publishManifest(fs, mDir, 1, Seq("data/v1/part-a"))
    val race = intercept[IllegalArgumentException](
      publishManifest(fs, mDir, 1, Seq("data/v1/part-b")))
    assert(race.getMessage.contains("already committed"))
    val winner = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_manifests", "v1.list")), "UTF-8")
    assert(winner.contains("part-a") && !winner.contains("part-b"),
      "losing committer overwrote the winner's manifest")

    // the CLAIM arbitrates before any destructive step: with a claim
    // planted (a concurrent committer, or a crashed one), commitVersion
    // fails loudly having touched nothing — the winner's data dir
    // survives; removing the stale claim unblocks the retry
    val dirC = java.nio.file.Files.createTempDirectory("lakeclaim").toString
    commitVersion(spark, dirC, Seq((1L, "a")).toDF("id", "tag"), 1)
    new java.io.File(dirC, "_manifests").mkdirs()
    val claimFile = new java.io.File(dirC, "_manifests/.v2.claim")
    claimFile.createNewFile()
    val dataBefore = new java.io.File(dirC, "data/v1").list().sorted.toSeq
    val eClaim = intercept[IllegalArgumentException](
      commitVersion(spark, dirC, Seq((2L, "b")).toDF("id", "tag"), 2))
    assert(eClaim.getMessage.contains("active claim"))
    assert(new java.io.File(dirC, "data/v1").list().sorted.toSeq == dataBefore,
      "a claim-blocked committer must not touch existing data")
    assert(!new java.io.File(dirC, "data/v2").exists(),
      "a claim-blocked committer must not write data")
    claimFile.delete()
    commitVersion(spark, dirC, Seq((2L, "b")).toDF("id", "tag"), 2)
    assert(readVersion(spark, dirC, 2).count() == 1)
    assert(!claimFile.exists(), "a successful commit must release its claim")

    // a manifest with no #files footer is a mid-publish crash: reads
    // reject it loudly rather than serving a truncated file set
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", "v2.list"),
      "data/v2/part-x\ndata/v2/part-y\n".getBytes("UTF-8"))
    val partial = intercept[IllegalArgumentException](readVersion(spark, dir, 2))
    assert(partial.getMessage.contains("partial/corrupt"))
    // ...as is a footer whose count disagrees with the listed files
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_manifests", "v2.list"),
      "data/v2/part-x\n#files=2\n".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](readVersion(spark, dir, 2))
      .getMessage.contains("partial/corrupt"))

    // half-vacuumed state (tombstone laid, manifest still present — the
    // documented crash window): reads answer "was vacuumed", the number
    // is burned, and RE-RUNNING vacuum heals completely
    val dir2 = java.nio.file.Files.createTempDirectory("lakeheal").toString
    commitVersion(spark, dir2, Seq((1L, "a")).toDF("id", "tag"), 1)
    commitVersion(spark, dir2, Seq((2L, "b")).toDF("id", "tag"), 2)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir2, "_manifests", "v1.vacuumed"),
      Array.empty[Byte])
    assert(intercept[IllegalArgumentException](readVersion(spark, dir2, 1))
      .getMessage.contains("was vacuumed"))
    // in the half-vacuumed state BOTH files exist, so recommit trips the
    // manifest-exists check first — either message is a correct refusal
    val blocked = intercept[IllegalArgumentException](
      commitVersion(spark, dir2, Seq((3L, "c")).toDF("id", "tag"), 1))
    assert(blocked.getMessage.contains("immutable") ||
      blocked.getMessage.contains("never reused"))
    vacuum(spark, dir2, Seq(2))
    assert(!new java.io.File(dir2, "_manifests/v1.list").exists(),
      "re-run vacuum did not finish the half-vacuumed manifest delete")
    assert(!new java.io.File(dir2, "data/v1").exists(),
      "re-run vacuum did not reclaim the half-vacuumed data dir")
    assert(readVersion(spark, dir2, 2).count() == 1)
  }
}
