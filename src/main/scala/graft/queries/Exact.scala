package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine exactness helpers shared by all oracle-checked queries.
  *
  * The driver compares Spark parquet output against DuckDB running the
  * oracle SQL, value-exact after sorting. Doubles are only comparable when
  * both engines perform the *same* IEEE operations in the *same* order, so:
  *
  *   - SUM over DOUBLE goes through DECIMAL (exact, order-independent),
  *     then casts back to DOUBLE. Spark's partial/final (map-side combine)
  *     aggregation order vs DuckDB's sequential order then cannot matter.
  *   - AVG = exact decimal SUM cast to double, then ONE IEEE division by
  *     the group count — identical operands, identical result.
  *   - MIN/MAX over doubles are order-independent already.
  *   - Time projections stay at second-or-coarser granularity: events.ts
  *     has shipped as parquet TIMESTAMP(NANOS) (Spark truncates to micros
  *     via nanosAsLong + div 1000, DuckDB keeps nanos) and as
  *     TIMESTAMP(MICROS) (both engines read micros — exact); the loader
  *     normalises either rendition (Tables.normalizeTs).
  *   - Window/rank orderings always end in a unique key so the total
  *     order — and therefore every frame — is engine-independent.
  */
object Exact {
  /** Order-independent exact sum of a double column, returned as double.
    * decimal(27,4) holds |x| < 10^23 at 4dp: safe for testdata sums and
    * for ~10^9-row (100 TB) scale sums of values up to 10^14. */
  def dsum(c: Column): Column = sum(c.cast("decimal(27,4)")).cast("double")

  def dsumSql(e: String): String =
    s"CAST(SUM(CAST($e AS DECIMAL(27,4))) AS DOUBLE)"

  /** Exact average: decimal sum cast to double, one division by count. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def davgSql(e: String): String = s"${dsumSql(e)} / COUNT(*)"

  /** Higher-precision per-value decimal for window frames / small groups. */
  def dec10(c: Column): Column = c.cast("decimal(28,10)")

  /** Knuth multiplicative hash mod 2³² — the deterministic bucketing
    * primitive behind every hash split / fold / sample / shuffle entry
    * (one definition, six call sites, each with a SQL twin via
    * [[knuthHash32Sql]]). Bijective mod 2³² (odd multiplier), uniform
    * enough for split ratios. SAFE ID DOMAIN: the multiply is 64-bit
    * LONG math, so ids must stay below 2⁶³/2654435761 ≈ 3.47·10⁹ —
    * beyond that Spark wraps to a NEGATIVE hash while the oracle
    * engine raises an overflow error; a larger id space routes the
    * multiply through DECIMAL (or uses a 64-bit odd multiplier with
    * explicit mod-2⁶⁴ wrapping on BOTH engines) instead of this
    * literal expression. */
  def knuthHash32(id: Column): Column =
    (id * lit(2654435761L)) % lit(4294967296L)

  def knuthHash32Sql(e: String): String =
    s"($e * 2654435761) % 4294967296"
}
