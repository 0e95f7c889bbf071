package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Flatten.FlatDp

/** M3-M7: dataset augmentation (nnTraining2/augmentData.py), as
  * deterministic distributed generators — every synthetic row is a pure
  * function of (source row, copy index, seed), so re-runs and
  * repartitioning cannot change the output (SURVEY §7.4.5).
  *
  * All replication uses explode(sequence(...)) — a Catalyst Generator —
  * never a driver loop; per-user deficits come from a broadcast count
  * join, not a collect.
  */
object Augment {

  /** C17 synthetic-id scheme: "{id}-{k}" (augmentData.py:110-123). */
  private def synthId(idCol: String, copyCol: String) =
    concat(col(idCol), lit("-"), col(copyCol).cast("string"))

  /** M3: event-level random oversampling — replicate each matching event
    * `factor` times with synthetic ids (copy 0 keeps the original id).
    * factor <= 1 means "no extra copies" and must short-circuit:
    * sequence(1, 0) would DESCEND ([1, 0]) and silently add two. */
  def oversample(events: DataFrame, idCol: String, factor: Int,
                 predicate: org.apache.spark.sql.Column): DataFrame = {
    if (factor <= 1) return events
    val matched = events.filter(predicate)
      .withColumn("__copy", explode(expr(s"sequence(1, ${factor - 1})")))
      .withColumn(idCol, synthId(idCol, "__copy"))
      .drop("__copy")
    events.unionByName(matched)
  }

  /** M3 undersampling: keep a deterministic hash-fraction of matches. */
  def undersample(events: DataFrame, idCol: String, keepFrac: Double,
                  predicate: org.apache.spark.sql.Column, seed: Long = 42L): DataFrame =
    events.filter(!predicate ||
      pmod(xxhash64(col(idCol).cast("string"), lit(seed)), lit(1000000L))
        < (keepFrac * 1000000).toLong)

  /** M6: user augmentation — oversample each user's seizure events until
    * every user reaches the max per-user count (augmentData.py:126-186).
    * Deficit = maxCount - userCount; each event contributes
    * ceil(deficit / userCount) extra copies, trimmed by row_number. */
  def userAugment(events: DataFrame, idCol: String, userCol: String): DataFrame = {
    val counts = events.groupBy(userCol).agg(count(lit(1)).as("__n"))
    val maxN = counts.agg(max("__n")).first().getLong(0)
    val extra = events
      .join(broadcast(counts), Seq(userCol))
      .withColumn("__copies", ceil((lit(maxN) - col("__n")) / col("__n")).cast("int"))
      .filter(col("__copies") > 0)
      .withColumn("__copy", explode(expr("sequence(1, __copies)")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(userCol).orderBy(col(idCol), col("__copy"))))
      .filter(col("__rn") <= lit(maxN) - col("__n"))
      .withColumn(idCol, synthId(idCol, "__copy"))
      .drop("__n", "__copies", "__copy", "__rn")
    events.unionByName(extra)
  }

  /** M7: tonic-clonic augmentation (augmentData.py:770-860): duplicate
    * seizure events (type == 1) whose subType contains BOTH 'tonic' and
    * 'clonic' case-insensitively after stripping — 'Tonic-Clonic',
    * 'tonic clonic', etc all match; null/non-seizure rows never do.
    * `tcAugFac` = extra copies per matching event (reference default 1
    * means 2x total), realised through [[oversample]]'s synthetic-id
    * replication. */
  def tonicClonicAugment(events: DataFrame, idCol: String,
                         tcAugFac: Int = 1): DataFrame = {
    val st = lower(trim(coalesce(col("subType"), lit(""))))
    oversample(events, idCol, tcAugFac + 1,
      col("type") === 1 && st.contains("tonic") && st.contains("clonic"))
  }

  /** M4: noise augmentation — per seizure event x factor, add N(0, sigma)
    * to each 3D sample and recompute magnitude (augmentData.py:188-314).
    * Noise is seeded per (eventId, copy), deterministic across runs. */
  def noiseAugment(dps: Dataset[FlatDp], factor: Int, sigmaMilliG: Double,
                   seed: Long = 42L): Dataset[FlatDp] = {
    val spark = dps.sparkSession
    import spark.implicits._
    dps.flatMap { dp =>
      val copies =
        if (dp.`type` == 1 && dp.rawData3D.nonEmpty) 1 to factor else Seq.empty
      Iterator(dp) ++ copies.iterator.map { k =>
        val rng = new java.util.Random(seed ^ (dp.eventId.hashCode.toLong << 20) ^
          (k.toLong << 40) ^ dp.tsSec)
        val noisy = dp.rawData3D.map(v => v + rng.nextGaussian() * sigmaMilliG)
        val mag = Array.tabulate(noisy.length / 3) { i =>
          val x = noisy(3 * i); val y = noisy(3 * i + 1); val z = noisy(3 * i + 2)
          math.sqrt(x * x + y * y + z * z)
        }
        dp.copy(eventId = s"${dp.eventId}-$k", rawData = mag, rawData3D = noisy,
          synthetic = true)
      }
    }
  }

  /** M5: phase augmentation — re-window each seizure event's concatenated
    * signal at shifted offsets, producing `factor` synthetic events whose
    * datapoints start `offset` samples into the record
    * (augmentData.py:316-469). 1 event → N events: flatMapGroups. */
  def phaseAugment(dps: Dataset[FlatDp], factor: Int): Dataset[FlatDp] = {
    val spark = dps.sparkSession
    import spark.implicits._
    val n = graft.model.Osdb.SamplesPerDatapoint
    dps.groupByKey(_.eventId).flatMapGroups { (_, it) =>
      val sorted = it.toArray.sortBy(d => (d.tsSec, d.seq))
      if (sorted.isEmpty || sorted.head.`type` != 1) sorted.iterator
      else {
        val total = sorted.length * n
        val mag = new Array[Double](total)
        val xyz = new Array[Double](total * 3)
        val has3d = sorted.head.rawData3D.nonEmpty
        sorted.zipWithIndex.foreach { case (dp, d) =>
          Array.copy(dp.rawData, 0, mag, d * n, math.min(n, dp.rawData.length))
          if (has3d)
            Array.copy(dp.rawData3D, 0, xyz, d * n * 3,
              math.min(3 * n, dp.rawData3D.length))
        }
        val shifted = (1 to factor).iterator.flatMap { k =>
          val offset = k * n / (factor + 1)
          val nDpOut = (total - offset) / n
          (0 until nDpOut).iterator.map { d =>
            val s = offset + d * n
            val dpProto = sorted(math.min(d, sorted.length - 1))
            dpProto.copy(
              eventId = s"${dpProto.eventId}-p$k",
              tsSec = sorted.head.tsSec + 5L * d,
              rawData = mag.slice(s, s + n),
              rawData3D = if (has3d) xyz.slice(s * 3, (s + n) * 3) else Array.emptyDoubleArray,
              synthetic = true)
          }
        }
        sorted.iterator ++ shifted
      }
    }
  }
}
