package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At
  * 100 TB these would be partitioned lakes; the loaders deliberately take
  * a directory so the same code reads a partitioned layout unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** events.ts has shipped under more than one physical parquet schema —
    * TIMESTAMP(NANOS) (which Spark 4 surfaces as LongType under
    * `spark.sql.legacy.parquet.nanosAsLong`, set in every session builder)
    * and TIMESTAMP(MICROS) (TimestampType when
    * `spark.sql.parquet.inferTimestampNTZ.enabled=false`, TIMESTAMP_NTZ
    * otherwise). A production lake sees exactly this physical-type drift
    * as writers upgrade, so the loader adapts to whatever the scan
    * produced and normalises every rendition to the session-UTC
    * TimestampType the rest of the engine is written against.
    *
    * Prefer the `inferTimestampNTZ.enabled=false` session conf for micros
    * files: the scan then emits TimestampType directly and time-range
    * predicates push down to the parquet reader (PlanSpec pins this); the
    * NTZ branch below is a correctness fallback that costs a per-row cast.
    */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other => throw new IllegalArgumentException(
        s"events.ts: unexpected physical type $other — extend Tables.normalizeTs")
    }

  /** Spread a SMALL scan to cluster width — conditionally (r19 opt
    * round; guide §2.5 "input skew: one huge unsplittable file …
    * repartition immediately after the read"). The driver tables are
    * each ONE parquet file with one row group, so a scan is ONE task
    * and every per-row kernel stacked on it (shingling, fingerprints,
    * vector math, tokenization) ran single-threaded up to the query's
    * first exchange. Scale-adaptive by construction: the repartition
    * fires only when the scan yielded fewer partitions than
    * defaultParallelism — a production many-split lake scan is
    * untouched, so this can never become a payload shuffle at scale.
    * Row-to-partition assignment stays deterministic under retries
    * (Spark's sort-before-repartition, SPARK-23207); the whole oracle
    * registry is partition-layout-invariant (the part7/split256k audit
    * legs force exactly this class of change). */
  def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df
  }

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  // NOT spread here (measured, r19): a blanket spread on the corpus
  // tables consistently SLOWED the multi-pass consumers (ivfKnn's
  // quantizer/assignment passes, lm1's count passes re-execute the
  // scan, so each pass paid the added exchange: e4 ×1.58, e5 ×1.70,
  // lm1 ×1.60) while helping single-pass kernels. spread() is applied
  // surgically inside the single-pass fingerprinting operators instead
  // (Dedup.duplicateSpanRemoval / minHashCandidates / simHashCandidates
  // — d7 ×0.50, d3 ×0.66 measured).
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
