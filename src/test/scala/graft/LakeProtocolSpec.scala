package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, FilterFileSystem, Path}
import org.apache.spark.sql.functions._

import graft.sources.LakeMaintenance._

/** A local filesystem whose `create(path, overwrite = false)` is a TRUE
  * atomic exclusive create (POSIX O_EXCL via `Files.createFile`), under
  * the scheme `atomic:`. RawLocalFileSystem's exclusive create is
  * check-then-act — two barrier-synced committer threads can BOTH pass
  * the exists() check, which would test the local FS's hole rather than
  * the claim protocol. This is the HDFS/object-store semantics the
  * protocol's docblock assumes, made available to a threaded spec. */
class AtomicLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("atomic:///")
  override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
    if (!overwrite) {
      val local = pathToFile(f)
      val parent = local.getParentFile
      if (parent != null) parent.mkdirs()
      try Files.createFile(local.toPath)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      }
      new FSDataOutputStream(new java.io.FileOutputStream(local, false), null)
    } else super.create(f, overwrite)
  }
}

/** The versioned-lake commit/read protocol under adversity: in-process
  * publish failure (no wedge), a slow publisher vs a reader (bounded
  * claim-aware retry), a crashed publisher (loud, fast), and two REAL
  * threads racing commitVersion (exactly one winner per trial). */
class LakeProtocolSpec extends SparkSpec {

  test("publishManifest: in-process write failure deletes the partial manifest — retry commits") {
    val dir = Files.createTempDirectory("lakewedge").toString
    val real = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mDir = new Path(dir, "_manifests")
    // an FS whose exclusive create SUCCEEDS but whose first write throws
    // (disk full / transient store error after the create won the race)
    val failing: FileSystem = new FilterFileSystem(real) {
      override def create(f: Path, overwrite: Boolean): FSDataOutputStream = {
        val under = super.create(f, overwrite)
        new FSDataOutputStream(new java.io.OutputStream {
          override def write(b: Int): Unit = {
            under.close()
            throw new java.io.IOException("injected: disk full")
          }
        }, null)
      }
    }
    val e = intercept[java.io.IOException](
      publishManifest(failing, mDir, 7, Seq("data/v7/part-a")))
    assert(e.getMessage.contains("injected"))
    // the footerless partial must NOT be left behind (it would wedge the
    // version: every retry would see "already committed" forever)
    assert(!new File(dir, "_manifests/v7.list").exists(),
      "failed publish left a partial manifest — version is wedged")
    // and a clean retry of the same version commits
    publishManifest(real, mDir, 7, Seq("data/v7/part-a"))
    val content = new String(Files.readAllBytes(
      Paths.get(dir, "_manifests", "v7.list")), "UTF-8")
    assert(content.contains("part-a") && content.contains("#files=1"))
  }

  test("readVersion: crashed publisher fails fast; slow publisher is retried while the claim is held; hung claim fails loud") {
    import spark.implicits._
    val dir = Files.createTempDirectory("lakeslow").toString
    commitVersion(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"), 1)
    val v1Files = new File(dir, "data/v1").list()
      .filter(_.startsWith("part-")).sorted.map(n => s"data/v1/$n").toSeq
    val m2 = Paths.get(dir, "_manifests", "v2.list")
    val claim2 = Paths.get(dir, "_manifests", ".v2.claim")
    def writeFooterless(): Unit =
      Files.write(m2, (v1Files.mkString("\n") + "\n").getBytes("UTF-8"))
    def writeComplete(): Unit =
      Files.write(m2, ((v1Files :+ s"#files=${v1Files.size}")
        .mkString("\n") + "\n").getBytes("UTF-8"))

    // CRASHED publisher: footerless manifest, NO claim — one re-read,
    // then a loud partial/corrupt verdict, well under the retry budget
    writeFooterless()
    val t0 = System.nanoTime()
    val crashed = intercept[IllegalArgumentException](readVersion(spark, dir, 2))
    val crashedMs = (System.nanoTime() - t0) / 1000000
    assert(crashed.getMessage.contains("partial/corrupt"))
    assert(crashedMs < 2000,
      s"crashed-publisher read burned the full retry budget (${crashedMs}ms)")

    // SLOW publisher: claim held, manifest half-written; the publisher
    // finishes ~600ms later (far past the old single 100ms re-read) —
    // the claim-aware retry must ride it out and read successfully
    Files.createFile(claim2)
    writeFooterless()
    val publisher = new Thread(() => {
      Thread.sleep(600)
      writeComplete()
      Files.delete(claim2)
    })
    publisher.start()
    assert(readVersion(spark, dir, 2).count() == 2,
      "reader gave up on a healthy mid-publish commit")
    publisher.join()

    // HUNG claim: claim held, manifest never completed — the bounded
    // budget expires and the verdict names the mid-publish state
    val m3 = Paths.get(dir, "_manifests", "v3.list")
    Files.createFile(Paths.get(dir, "_manifests", ".v3.claim"))
    Files.write(m3, (v1Files.mkString("\n") + "\n").getBytes("UTF-8"))
    val hung = intercept[IllegalArgumentException](readVersion(spark, dir, 3))
    assert(hung.getMessage.contains("mid-publish"))
  }

  test("claim protocol stress: two threads race commitVersion 100x — one winner, loser touches nothing, manifest byte-complete") {
    import spark.implicits._
    // register the atomic-exclusive-create local FS (see [[AtomicLocalFs]])
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setClass("fs.atomic.impl", classOf[AtomicLocalFs], classOf[FileSystem])
    val base = Files.createTempDirectory("lakestress").toString
    val dir = "atomic://" + base
    val dfA = Seq((1L, "A")).toDF("id", "tag")
    val dfB = Seq((2L, "B")).toDF("id", "tag")
    var winsA = 0; var winsB = 0
    for (v <- 1 to 100) {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      @volatile var okA = false; @volatile var okB = false
      @volatile var errA: Throwable = null; @volatile var errB: Throwable = null
      val ta = new Thread(() => {
        barrier.await()
        try { commitVersion(spark, dir, dfA, v); okA = true }
        catch { case t: Throwable => errA = t }
      })
      val tb = new Thread(() => {
        barrier.await()
        try { commitVersion(spark, dir, dfB, v); okB = true }
        catch { case t: Throwable => errB = t }
      })
      ta.start(); tb.start(); ta.join(60000); tb.join(60000)
      assert(okA ^ okB,
        s"v$v: expected exactly one winner, got okA=$okA okB=$okB " +
          s"(errA=$errA errB=$errB)")
      val loserErr = if (okA) errB else errA
      assert(loserErr.isInstanceOf[IllegalArgumentException],
        s"v$v: loser must fail with the protocol's loud refusal, got $loserErr")
      val msg = loserErr.getMessage
      assert(msg.contains("active claim") || msg.contains("immutable") ||
        msg.contains("already committed"),
        s"v$v: unexpected loser message: $msg")
      // winner's manifest is byte-complete (footer matches) and the
      // committed content is EXACTLY the winner's row — the loser wrote
      // nothing into the version
      val manifest = new String(Files.readAllBytes(
        Paths.get(base, "_manifests", s"v$v.list")), "UTF-8")
      val fileLines = manifest.split("\n").filter(l => l.nonEmpty && !l.startsWith("#"))
      assert(manifest.trim.endsWith(s"#files=${fileLines.length}"),
        s"v$v: winner's manifest footer incomplete: $manifest")
      val tags = readVersion(spark, dir, v).select("tag")
        .collect().map(_.getString(0)).toSeq
      val expect = if (okA) Seq("A") else Seq("B")
      assert(tags == expect, s"v$v: committed content $tags != winner $expect")
      // no stale claim survives a decided race
      assert(!new File(base, s"_manifests/.v$v.claim").exists(),
        s"v$v: stale claim left behind")
      if (okA) winsA += 1 else winsB += 1
    }
    info(s"100 trials: A won $winsA, B won $winsB")
  }
}
