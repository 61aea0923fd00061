package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers enforcing the SURVEY §7.4 determinism rules.
  *
  * The driver hash-compares each query's parquet output against DuckDB, so
  * every floating aggregate must be order-independent: we cast the per-row
  * double expression (bitwise identical in both engines) to DECIMAL(18,4),
  * sum exactly, and emit as double. Summing raw doubles would drift with
  * partition count / merge order and flip low decimals run-to-run.
  */
object U {
  /** Query signature used throughout: (session, sfDir) => result. */
  type Q = (SparkSession, String) => DataFrame

  // Scale 6, not 4: the testdata's doubles carry at most 2 decimal digits,
  // so row-level products (price·(1−disc)·(1+tax)) carry at most 6 — at
  // scale 6 the decimal grid point is ~5e-7 away from the nearest rounding
  // boundary while the double sits within ~1e-11 of the grid, so Spark's
  // exact BigDecimal cast and DuckDB's scaled-multiply cast agree on every
  // row. At scale 4 they disagreed on boundary rows (observed 3e-4 drift).
  val D: DecimalType = DecimalType(18, 6)

  /** Order-independent exact sum of a double expression, emitted as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact-sum-based mean, emitted as double (same division in DuckDB). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Epoch seconds (floored) of a timestamp column — safe to output where
    * raw timestamps are not (parquet ns vs Spark µs truncation). */
  def epochS(c: Column): Column = c.cast("long")

  def ts(s: String): Column = lit(s).cast("timestamp")

  /** DuckDB fragment: order-independent decimal sum of a double expr. */
  def oDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"

  def oDavg(expr: String): String = s"${oDsum(expr)} / COUNT(*)"

  /** Spark SQL fragment: fold the first `n` hex digits of `hex` into a
    * BIGINT — the portable-hash idiom every md5-derived integer (minhash,
    * sampling buckets, payload checks) uses; `n ≤ 15` keeps it positive. */
  def hexFold(hex: String, n: Int): String =
    s"CAST(conv(substring($hex, 1, $n), 16, 10) AS BIGINT)"

  /** DuckDB twin of [[hexFold]] — same integer fold, digit by digit. */
  def oHexFold(hex: String, n: Int): String =
    s"""list_reduce(list_transform(string_split(substring($hex, 1, $n), ''),
          c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
          (x, c) -> x * 16 + c)"""
}
