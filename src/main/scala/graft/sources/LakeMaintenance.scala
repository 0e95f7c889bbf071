package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake maintenance: small-file compaction for partitioned parquet lakes
  * (SURVEY §1.3's normalized layout under churn).
  *
  * Incremental ingest — S6 upsert batches, streaming sinks, per-category
  * appends — leaves each partition directory with dozens-to-thousands of
  * small files; at 100 TB the scan cost becomes file-open dominated
  * (listing, footer reads, one input split per tiny file) long before
  * bytes dominate. Compaction rewrites each partition's rows into
  * size-bounded files WITHOUT changing content.
  *
  * Shape: one declarative job — `repartition(partitionCol)` lines the
  * data up one-shuffle-task-per-partition (AQE coalesces empties), and
  * the writer's `maxRecordsPerFile` rolls each task's output into
  * ceil(rows/max) files, so the file count per partition is bounded by
  * construction. No driver loop over partitions, no per-partition jobs:
  * the same plan compacts 10 partitions or 10,000. (Row count is the
  * size proxy — records here are near-fixed width; a byte-exact target
  * would need the writer's rolling policy, which parquet's row-group
  * granularity approximates anyway.) The rewrite lands in `destDir`;
  * swapping it over the source is the caller's (atomic-rename /
  * metastore) move — in-place rewrite without a transaction log is how
  * lakes lose data.
  *
  * [[compactionStats]] reports files/rows per partition for both dirs.
  * The listing is driver-side O(files) — the stats instrument, not the
  * compaction path; a production lake reads its manifest instead.
  */
object LakeMaintenance {

  def compact(spark: SparkSession, srcDir: String, destDir: String,
              partitionCol: String, maxRecordsPerFile: Long): Unit =
    spark.read.parquet(srcDir)
      .repartition(col(partitionCol))
      .write.mode("overwrite").partitionBy(partitionCol)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(destDir)

  // ------------------------------------------------------- Z-order layout

  /** Spread the low 16 bits of `c` to even bit positions (Morton
    * interleave half) — pure shift/mask built-ins, whole-stage codegen.
    */
  private def spread16(c: Column): Column = {
    var x = c.cast("long").bitwiseAND(lit(0xFFFFL))
    x = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    x = (x.bitwiseOR(shiftleft(x, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    x = (x.bitwiseOR(shiftleft(x, 2))).bitwiseAND(lit(0x33333333L))
    x = (x.bitwiseOR(shiftleft(x, 1))).bitwiseAND(lit(0x55555555L))
    x
  }

  /** 32-bit Morton Z-value of two 16-bit normalized ranks. */
  def zValue(a16: Column, b16: Column): Column =
    spread16(a16).bitwiseOR(shiftleft(spread16(b16), 1))

  /** Z-ORDER the lake on two numeric dimensions: rows are laid out along
    * the Morton curve of (a, b) min-max-normalized to 16-bit grids, so
    * every file covers a LOCALIZED BOX in (a, b) space and parquet
    * min/max stats can skip files/row-groups for predicates on EITHER
    * dimension — the multi-column data-skipping lever a single-key sort
    * cannot give (sorting by `a` leaves every file spanning the full
    * `b` range). This is the same layout decision Delta/Iceberg expose
    * as `OPTIMIZE ... ZORDER BY`; here it is plain Spark: one global
    * min/max agg (two driver scalars per dimension — control plane), a
    * codegen bit-interleave, one `repartitionByRange` exchange on the
    * z-value, an in-partition sort, and a parquet write. Re-clustering
    * after churn composes with [[compact]].
    *
    * Ties/degenerate spans: a constant dimension normalizes to rank 0
    * everywhere (span clamped to 1) and the curve degrades to a plain
    * sort on the other dimension — never a division by zero. */
  def writeZOrdered(df: DataFrame, destDir: String,
                    dimA: Column, dimB: Column, numFiles: Int): Unit = {
    // cast the bounds agg, not just the per-row rank: any integral
    // dimension type (int/short/long) reads back uniformly, and an
    // empty frame fails loudly instead of NPE-ing on null bounds
    val r = df.agg(min(dimA.cast("long")), max(dimA.cast("long")),
      min(dimB.cast("long")), max(dimB.cast("long"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      "writeZOrdered: empty input or all-null dimension")
    def lo(i: Int): Long = r.getLong(i)
    val (aLo, aHi, bLo, bHi) = (lo(0), lo(1), lo(2), lo(3))
    def rank16(c: Column, l: Long, h: Long): Column =
      ((c.cast("long") - lit(l)) * lit(65535L) / lit(math.max(h - l, 1L)))
    df.withColumn("__z",
        zValue(rank16(dimA, aLo, aHi), rank16(dimB, bLo, bHi)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(destDir)
  }

  // --------------------------------------------------------- targeted delete

  /** Targeted delete over a partitioned lake — the right-to-be-forgotten
    * / bad-batch-recall operation: remove every row matching `predicate`
    * while REWRITING ONLY THE PARTITIONS THAT CONTAIN MATCHES. At 100 TB
    * the difference between "rewrite the lake" and "rewrite 3 of 10,000
    * partition dirs" is the whole operation.
    *
    * Shape: one find pass (matching rows → distinct partition values —
    * column-pruned scan; with a partition-correlated predicate the scan
    * itself prunes, and a production lake would consult a Bloom/manifest
    * index first), one job writing the affected partitions' SURVIVING
    * rows to a staging lake, then O(affected) driver-side directory
    * swaps: delete the old dir, rename the staged one in — a partition
    * whose every row matched simply has no staged dir and stays deleted.
    * Untouched partitions are never read for rewrite and their files
    * never change (the spec asserts byte-listing equality). Staging +
    * swap rather than in-place dynamic overwrite because Spark cannot
    * safely overwrite a path it is concurrently reading without a
    * transaction log. The swap itself is delete+rename, NOT atomic: a
    * crash between the two leaves that partition's survivors in the
    * staging dir (recoverable by hand — the stage is only cleaned after
    * every rename has been VERIFIED to succeed; a failed rename aborts
    * loudly with the survivors intact); true atomicity is what the
    * transaction-log formats exist for — and what this lake's OWN
    * versioned layer provides: [[deleteWhereVersioned]] commits the
    * same targeted delete as a create-exclusive manifest publication
    * with file-level
    * pruning. Prefer it when the data lives in the versioned lake;
    * this partitioned-directory variant remains for plain
    * `partitionBy` layouts with no version history.
    *
    * NULL predicate rows are KEPT: "delete where v = 99" must not also
    * forget rows where v is unknown, so the survivor filter coalesces
    * the predicate's NULLs to false on both the find and keep sides.
    *
    * Partition values are formatted `col=value` — the plain layout this
    * lake writes; values needing hive escaping (spaces, slashes) would
    * need the escaper before the rename, fail-loud here. */
  def deleteWhere(spark: SparkSession, dir: String, partitionCol: String,
                  predicate: Column): DataFrame = {
    import spark.implicits._
    val df = spark.read.parquet(dir)
    // NULL-safe: rows where the predicate is NULL neither match nor die
    val matches = coalesce(predicate, lit(false))
    val affected = df.filter(matches).select(partitionCol).distinct()
      .collect().map(_.get(0).toString).sorted
    affected.foreach { v =>
      require(v.matches("[A-Za-z0-9_.-]+"),
        s"partition value '$v' needs hive escaping — not supported")
    }
    if (affected.isEmpty) return Seq.empty[(String, Long)]
      .toDF("partition", "rows_remaining")
    val stage = dir.stripSuffix("/") + "__delete_stage"
    val remaining = df
      .filter(col(partitionCol).isin(affected.toIndexedSeq: _*) && !matches)
    remaining.write.mode("overwrite").partitionBy(partitionCol).parquet(stage)
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    affected.foreach { v =>
      val dest = new Path(dir, s"$partitionCol=$v")
      val src = new Path(stage, s"$partitionCol=$v")
      fs.delete(dest, true)
      if (fs.exists(src)) {
        // a silent rename failure here would let the stage cleanup below
        // destroy this partition's only copy of its surviving rows
        require(fs.rename(src, dest),
          s"rename $src -> $dest failed; survivors left in $stage")
      }
    }
    fs.delete(new Path(stage), true)
    // re-read only if anything is left: a delete that emptied every
    // partition leaves no parquet files and the read would throw AFTER
    // the lake was already (correctly) emptied
    val anyLeft = fs.listStatus(new Path(dir))
      .exists(s => s.isDirectory && s.getPath.getName.contains("="))
    val counts =
      if (!anyLeft) Map.empty[String, Long]
      else spark.read.parquet(dir)
        .filter(col(partitionCol).isin(affected.toIndexedSeq: _*))
        .groupBy(partitionCol).count()
        .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    affected.toSeq.map(v => (v, counts.getOrElse(v, 0L)))
      .toDF("partition", "rows_remaining")
  }

  /** Manifest-based snapshot versioning — time travel for reproducible
    * training runs (the Delta/Iceberg core idea at its minimum viable
    * shape): every commit writes its data files under an immutable
    * per-version directory and publishes an ATOMIC manifest (write tmp
    * + rename) listing every file visible at that version; readers
    * resolve a manifest, never a directory listing, so a version is a
    * frozen file SET regardless of later commits. Append commits carry
    * the previous manifest's files forward; a compaction/delete commit
    * would list replacement files instead — either way old versions
    * stay readable until their files are vacuumed.
    *
    * Scale notes: the manifest is O(files) driver-side text — exactly
    * what production table formats do (Iceberg manifests/avro, Delta
    * json log); data moves only through executor-side parquet writes.
    * Readers pay one small-file read before the parquet scan, and the
    * scan itself is an explicit file list (no directory listing storm).
    */
  /** Concurrent-committer safety: the manifest is published through
    * CREATE-EXCLUSIVE (`fs.create(path, overwrite = false)`) — on
    * filesystems with an atomic exclusive create (HDFS namenode,
    * object-store conditional put) two committers of the SAME version
    * cannot both win; the loser fails loudly with the already-committed
    * message instead of silently replacing a published manifest (the
    * old tmp+rename form lost exactly that race on RawLocalFileSystem,
    * whose rename replaces an existing destination). On a store whose
    * create(overwrite=false) is itself check-then-act (RawLocal), the
    * race window shrinks to the create call — the documented
    * single-writer maintenance contract covers the rest. A committer
    * crash mid-publish leaves a manifest without its `#files=` footer;
    * [[readVersion]] rejects it loudly as partial (and the version
    * number stays claimed) rather than serving a truncated file set. */
  def commitVersion(spark: SparkSession, dir: String, df: DataFrame,
                    version: Int, carryFrom: Option[Int] = None): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    commitVersionWithCarried(spark, dir, df, version,
      carryFrom.map(v => manifestFiles(fs, root, v)).getOrElse(Seq.empty))
  }

  /** Targeted delete INSIDE the versioned lake — the atomic answer to
    * [[deleteWhere]]'s documented delete+rename window: survivors of
    * the AFFECTED FILES ONLY are rewritten into the new version's data
    * dir, unaffected files are carried forward by reference, and the
    * manifest publication is the commit — readers see `fromVersion`,
    * `newVersion`, or a loud mid-publish/partial error (never a
    * half-swapped directory or a silently truncated file set). This is the Delta/
    * Iceberg delete shape at this lake's minimum viable size:
    * file-level pruning via `input_file_name()` provenance (one
    * column-pruned find pass; the file list is driver-side O(files)
    * control plane like the manifests), then one survivor write.
    *
    * NULL predicate rows are KEPT, exactly as in [[deleteWhere]].
    * The old version stays readable until [[vacuum]] reclaims it.
    *
    * @return (kind, n) counts: files_carried / files_rewritten /
    *         rows_deleted. */
  def deleteWhereVersioned(spark: SparkSession, dir: String,
                           fromVersion: Int, newVersion: Int,
                           predicate: Column): DataFrame = {
    import spark.implicits._
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rels = manifestFiles(fs, root, fromVersion)
    // absolute-URI → manifest-relative mapping by file name (part file
    // names embed a UUID; a collision would silently mis-carry a file,
    // so it is a loud require, not an assumption)
    val byName = rels.groupBy(r => new Path(r).getName)
    byName.foreach { case (n, rs) =>
      require(rs.size == 1, s"duplicate part-file name across versions: $n")
    }
    val snap = readVersion(spark, dir, fromVersion)
      .withColumn("__src", input_file_name())
    val matches = coalesce(predicate, lit(false))
    val affectedNames = snap.filter(matches).select("__src").distinct()
      .collect().map(r => new Path(r.getString(0)).getName).toSet
    val (affectedRels, carriedRels) =
      rels.partition(r => affectedNames.contains(new Path(r).getName))
    val rowsDeleted =
      if (affectedRels.isEmpty) 0L
      else {
        val survivors = snap
          .filter(!matches &&
            udf((p: String) => affectedNames.contains(new Path(p).getName))
              .apply(col("__src")))
          .drop("__src")
        val deleted = snap.filter(matches).count()
        commitVersionWithCarried(spark, dir, survivors, newVersion, carriedRels)
        deleted
      }
    if (affectedRels.isEmpty)
      commitVersionWithCarried(spark, dir,
        spark.emptyDataFrame, newVersion, carriedRels, writeData = false)
    Seq(("files_carried", carriedRels.size.toLong),
      ("files_rewritten", affectedRels.size.toLong),
      ("rows_deleted", rowsDeleted)).toDF("kind", "n")
  }

  /** [[commitVersion]] with an explicit carried-file list (the delete
    * commit's "unaffected files by reference" shape); `writeData=false`
    * publishes a carry-only manifest with no new files. */
  private def commitVersionWithCarried(spark: SparkSession, dir: String,
                                       df: DataFrame, version: Int,
                                       carried: Seq[String],
                                       writeData: Boolean = true): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val finalManifest = new Path(root, s"_manifests/v$version.list")
    // immutability is defined by the COMMITTED manifest, not the data
    // dir: a crash between the parquet write and the manifest publish
    // leaves an orphaned data dir for a version that never existed — a
    // retry must clean it and proceed, not wedge the version forever
    require(!fs.exists(finalManifest),
      s"version $version is already committed — versions are immutable")
    // a vacuumed version's number is burned: its tombstone proves it
    // existed, and re-committing it would resurrect a version readers
    // may have already observed as deleted
    require(!fs.exists(new Path(root, s"_manifests/v$version.vacuumed")),
      s"version $version was vacuumed — version numbers are never reused")
    // CLAIM the version BEFORE any destructive step: the create-exclusive
    // claim file is the race arbiter for the DATA DIR (the manifest's
    // own create-exclusive arbitrates publication, but by then a losing
    // committer would already have deleted the winner's data dir). A
    // loser fails here, loudly, having touched nothing. The claim also
    // marks the commit in-flight for readers (see [[publishManifest]]).
    // Crash window: a claim with no manifest is a crashed commit —
    // remove the stale claim (after confirming no committer is running)
    // and retry; the orphaned data dir is cleaned by the retry/vacuum.
    val mDir = new Path(root, "_manifests")
    fs.mkdirs(mDir)
    val claim = new Path(mDir, s".v$version.claim")
    try { fs.create(claim, false).close() }
    catch {
      case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
        throw new IllegalArgumentException(
          s"version $version has an active claim — another committer is " +
            "in flight, or a commit crashed (remove the stale " +
            s"$claim after verifying no committer is running)", e)
      case e: java.io.IOException if fs.exists(claim) =>
        throw new IllegalArgumentException(
          s"version $version has an active claim — another committer is " +
            "in flight, or a commit crashed (remove the stale " +
            s"$claim after verifying no committer is running)", e)
    }
    // Holding the claim: everything below releases it on ANY in-process
    // failure (a transient write error must not wedge the version behind
    // a stale claim — only a PROCESS CRASH leaves one, which is exactly
    // the documented recovery case). First RE-CHECK committed/vacuumed
    // UNDER the claim: a slow committer could have passed the early
    // checks before the winner published and released — without this
    // re-check it would delete the winner's PUBLISHED data dir.
    try {
      require(!fs.exists(finalManifest),
        s"version $version was committed while this committer raced it " +
          "— versions are immutable")
      require(!fs.exists(new Path(root, s"_manifests/v$version.vacuumed")),
        s"version $version was vacuumed — version numbers are never reused")
      val dataDir = new Path(root, s"data/v$version")
      fs.delete(dataDir, true)
      val newFiles =
        if (!writeData) Seq.empty
        else {
          df.write.parquet(dataDir.toString)
          fs.listStatus(dataDir).map(_.getPath)
            .filter(_.getName.startsWith("part-"))
            .map(p => s"data/v$version/${p.getName}").sorted.toSeq
        }
      publishManifest(fs, mDir, version, carried ++ newFiles)
    } catch {
      case t: Throwable => fs.delete(claim, false); throw t
    }
    fs.delete(claim, false)
  }

  /** The commit point: CREATE-EXCLUSIVE the final manifest and write
    * the full content in one call, closing with a `#files=<n>` footer.
    * The exclusive create is the race arbiter (see [[commitVersion]]'s
    * docblock); the footer is the completeness proof — a reader that
    * finds a manifest without it knows a committer died mid-publish
    * and fails loudly instead of reading a truncated file set. */
  private[graft] def publishManifest(fs: org.apache.hadoop.fs.FileSystem,
                                       mDir: Path, version: Int,
                                       files: Seq[String]): Unit = {
    fs.mkdirs(mDir)
    val finalManifest = new Path(mDir, s"v$version.list")
    val content =
      (files ++ Seq(s"#files=${files.size}")).mkString("\n") + "\n"
    val out =
      try fs.create(finalManifest, false)
      catch {
        // ONLY already-exists maps to the race message — a disk-full /
        // permission / transient-store IOException must surface as
        // itself, not masquerade as "already committed"
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new IllegalArgumentException(
            s"version $version is already committed (create-exclusive " +
              "lost the race) — versions are immutable", e)
        case e: java.io.IOException if fs.exists(finalManifest) =>
          throw new IllegalArgumentException(
            s"version $version is already committed (create-exclusive " +
              "lost the race) — versions are immutable", e)
      }
    // If the write/close fails AFTER the exclusive create succeeded, a
    // footerless manifest would be left behind while commitVersion's
    // catch releases the claim — retries would then hit the pre-claim
    // "already committed" require forever (a wedge the docblock promises
    // can't happen). The exclusive create proves THIS committer owns the
    // file, so deleting it before rethrowing is safe: no other committer
    // can have created it, and readers reject the footerless prefix.
    //
    // KNOWN WINDOW: close() can throw after the full content (footer
    // included) became byte-visible, in which case a concurrent reader
    // may already have successfully read version v before this delete.
    // A retry that re-commits DIFFERENT content for v would break the
    // immutability that reader observed. The contract is therefore:
    // a caller retrying a failed commitVersion must re-submit the SAME
    // logical content for the same version number (the normal retry
    // shape — the DataFrame and version are the retry's inputs). The
    // single-writer deployment assumption makes the window academic in
    // practice, but it is a contract, not a guarantee the code enforces.
    try {
      try out.write(content.getBytes("UTF-8")) finally out.close()
    } catch {
      case t: Throwable =>
        try fs.delete(finalManifest, false) catch { case _: Throwable => () }
        throw t
    }
  }

  /** Delete data files referenced by NO retained version's manifest —
    * the missing half of the versioning contract ("old versions stay
    * readable until their files are vacuumed"). Non-retained COMMITTED
    * versions lose their manifest and gain a `.vacuumed` tombstone, so
    * a later read fails loudly with "was vacuumed" (not the ambiguous
    * "no committed manifest") and the version number can never be
    * recommitted. Orphaned data files from crashed commits (data dir,
    * no manifest) are removed too. Retained versions' files are
    * untouched — the spec pins byte-identity across a vacuum.
    *
    * Driver-side O(files) listing + set difference, like the manifests
    * themselves — control plane, not data plane. Same single-writer /
    * maintenance-window contract as [[commitVersion]]: do not vacuum
    * concurrently with an in-flight commit (its not-yet-published data
    * dir looks orphaned).
    *
    * Crash recovery: the tombstone is created BEFORE the manifest is
    * deleted — deliberately, because the tombstone is what burns the
    * version number, and burning must survive a crash (the opposite
    * order would let a crashed vacuum's version be silently
    * recommitted). The cost is the intermediate state where BOTH files
    * exist: reads of that version already answer "was vacuumed" (the
    * tombstone check runs first) but its files are not yet reclaimed.
    * RE-RUNNING vacuum with the same retain list heals it completely —
    * the version is still in the committed set, so the tombstone is
    * re-laid, the manifest deleted, and the now-unreferenced data dir
    * swept.
    *
    * @return (kind, path) rows for every deleted artifact — kinds:
    *         `data_file`, `manifest` (replaced by a tombstone). */
  def vacuum(spark: SparkSession, dir: String,
             retainVersions: Seq[Int]): DataFrame = {
    import spark.implicits._
    require(retainVersions.nonEmpty,
      "vacuum: retainVersions must name at least one version")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mDir = new Path(root, "_manifests")
    val committed = (if (fs.exists(mDir)) fs.listStatus(mDir) else Array.empty)
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+\\.list") =>
        s.stripPrefix("v").stripSuffix(".list").toInt }
      .toSet
    retainVersions.foreach(v => require(committed.contains(v),
      s"vacuum: retained version $v is not committed (committed: " +
        s"${committed.toSeq.sorted.mkString(",")})"))
    val referenced = retainVersions
      .flatMap(v => manifestFiles(fs, root, v)).toSet
    val deleted = Seq.newBuilder[(String, String)]
    // sweep data/v* dirs: a dir with NO referenced files goes entirely
    // (its _SUCCESS/.crc sidecars included); a dir that retained
    // versions still reference loses only unreferenced part- files
    // (plus their checksum sidecars) — manifests list part- files only,
    // so sidecars must never be judged by manifest membership or a
    // vacuum would strip retained versions' checksums
    val dataRoot = new Path(root, "data")
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot)
      .filter(_.isDirectory).foreach { vd =>
        val files = fs.listStatus(vd.getPath)
        def rel(name: String) = s"data/${vd.getPath.getName}/$name"
        val anyReferenced =
          files.exists(f => referenced.contains(rel(f.getPath.getName)))
        if (!anyReferenced) {
          files.filter(_.isFile).foreach(f =>
            deleted += (("data_file", rel(f.getPath.getName))))
          require(fs.delete(vd.getPath, true),
            s"vacuum: delete ${vd.getPath} failed")
        } else files.foreach { f =>
          val name = f.getPath.getName
          if (name.startsWith("part-") && !referenced.contains(rel(name))) {
            require(fs.delete(f.getPath, false),
              s"vacuum: delete ${rel(name)} failed")
            deleted += (("data_file", rel(name)))
            fs.delete(new Path(vd.getPath, s".$name.crc"), false)
          }
        }
      }
    // tombstone non-retained committed versions
    (committed -- retainVersions).toSeq.sorted.foreach { v =>
      val out = fs.create(new Path(mDir, s"v$v.vacuumed"), true)
      out.close()
      require(fs.delete(new Path(mDir, s"v$v.list"), false),
        s"vacuum: manifest delete failed for v$v")
      deleted += (("manifest", s"_manifests/v$v.list"))
    }
    deleted.result().toDF("kind", "path")
  }

  /** The frozen snapshot at `version` — an explicit-file-list scan.
    * mergeSchema: carried and newly-committed files may differ in
    * schema (an append commit after a column was added); without the
    * merge, whichever file's footer wins inference would silently drop
    * the evolved columns from the snapshot — the lake6 evolution
    * semantics apply to versioned reads too. */
  def readVersion(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = manifestFiles(fs, root, version)
      .map(rel => new Path(root, rel).toString)
    // a committed-empty version (zero-partition write, no carry) has no
    // files to infer a schema from — spark.read.parquet() would throw
    // an opaque path/schema error; name the real condition instead
    require(files.nonEmpty,
      s"version $version is an empty snapshot — its manifest lists no files")
    spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  private def manifestFiles(fs: org.apache.hadoop.fs.FileSystem,
                            root: Path, version: Int): Seq[String] = {
    val m = new Path(root, s"_manifests/v$version.list")
    // the tombstone distinguishes "vacuumed away" from "never existed"
    require(!fs.exists(new Path(root, s"_manifests/v$version.vacuumed")),
      s"version $version was vacuumed — not retained by the last vacuum()")
    require(fs.exists(m), s"no committed manifest for version $version")
    def readLines(): Seq[String] = {
      val in = fs.open(m)
      val bytes = try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
          .foreach(n => buf.write(chunk, 0, n))
        buf.toByteArray
      } finally in.close()
      new String(bytes, "UTF-8").split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
    }
    // footer check: a manifest missing its `#files=` trailer (or with a
    // wrong count) is incomplete — reject loudly rather than serve a
    // truncated file set as if it were the version. A racing read of a
    // HEALTHY in-flight publish can also see a footerless prefix; the
    // claim file (created before the manifest, released after)
    // disambiguates: claim present = a committer is mid-publish, so
    // retry with backoff WHILE the claim exists (bounded — a committer
    // that holds the claim longer than the budget is indistinguishable
    // from a hung one, and the loud mid-publish error stays retriable);
    // claim absent = the committer died, fail immediately after one
    // re-read (the release itself races the footer write's visibility
    // by one small window). Manifests from before the footer format
    // need a one-line migration (append `#files=<n>`).
    def complete(lines: Seq[String]): Option[Seq[String]] = {
      val (fileLines, footers) = lines.partition(!_.startsWith("#"))
      if (footers.lastOption.contains(s"#files=${fileLines.size}"))
        Some(fileLines)
      else None
    }
    def claimHeld(): Boolean =
      fs.exists(new Path(root, s"_manifests/.v$version.claim"))
    var result = complete(readLines())
    var attempt = 0
    // 50ms * (2^6 - 1) ≈ 3.15s total backoff — a publish is one small
    // exclusive-create write, so a committer that outlives this budget
    // is indistinguishable from a hung one; the error stays retriable
    val maxAttempts = 6
    var sawClaim = false
    while (result.isEmpty && attempt < maxAttempts &&
           (attempt == 0 || claimHeld())) {
      if (attempt > 0) sawClaim = true
      Thread.sleep(50L << attempt) // 50,100,…,1600ms exponential backoff
      result = complete(readLines())
      attempt += 1
    }
    result.getOrElse {
      // One final complete read before choosing an error: a healthy
      // publisher can write the footer and release the claim AFTER this
      // reader's last re-read but BEFORE the loop's claimHeld() exit
      // check — the release-vs-visibility window. Without this read the
      // loop would throw "partial/corrupt" for a version that is now
      // fully committed; one extra read closes the window.
      complete(readLines()).getOrElse {
        throw new IllegalArgumentException(
          if (claimHeld() || sawClaim)
            s"manifest for version $version is mid-publish (a committer " +
              "holds the claim) — retry after the commit completes"
          else
            s"manifest for version $version is partial/corrupt (committer " +
              "crashed mid-publish?) — expected a matching '#files=' footer")
      }
    }
  }

  /** (partition, files_src, files_dest) per partition directory. */
  def compactionStats(spark: SparkSession, srcDir: String,
                      destDir: String): DataFrame = {
    import spark.implicits._
    def filesPerPartition(dir: String): Map[String, Int] = {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isDirectory).map { d =>
        d.getPath.getName ->
          fs.listStatus(d.getPath).count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
    }
    val src = filesPerPartition(srcDir)
    val dst = filesPerPartition(destDir)
    (src.keySet ++ dst.keySet).toSeq.sorted
      .map(k => (k, src.getOrElse(k, 0), dst.getOrElse(k, 0)))
      .toDF("partition", "files_src", "files_dest")
  }
}
