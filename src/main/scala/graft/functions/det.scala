package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers for DuckDB-oracle hash parity (SURVEY.md §7.5).
  *
  * Floating-point SUM over 60k+ rows is order-sensitive: worst-case drift
  * between two engines' partial-aggregation orders exceeds the 1e-4
  * rounding granularity. So every double SUM is routed through an exact
  * DECIMAL(30,10) accumulator — the per-row double expression is
  * bit-identical on both engines (same parquet bits, same IEEE ops), the
  * decimal conversion is a deterministic rounding at 1e-10, and decimal
  * addition is exact and order-independent. The final value is cast back
  * to double and rounded to 4 dp on BOTH sides, so the hash compare sees
  * identical bits regardless of partitioning — on local[4] today or 1000
  * executors at 100 TB.
  */
object det {
  // Every rounded value gets `+ 0.0` appended on BOTH engines: Spark's
  // round goes through BigDecimal (which has no -0, so a tiny negative
  // rounding to zero surfaces as +0.0) while DuckDB's ROUND keeps IEEE
  // sign (-0.0). The driver's hash compare distinguishes the two.
  // IEEE 754 addition normalizes: (-0.0) + 0.0 = +0.0, and x + 0.0 = x
  // for every other value — so the pair stays bit-identical through a
  // sign-of-zero disagreement (first observed on q112's mean_v at
  // sf0.1, where a dimension's decimal sum is a tiny negative).

  /** Order-independent sum of a double expression, rounded to 4 dp. */
  def dsum(c: Column): Column =
    round(sum(c.cast(DecimalType(30, 10))).cast("double"), 4) + 0.0

  /** Order-independent mean: exact decimal sum / count, rounded to 4 dp. */
  def davg(c: Column): Column =
    round(sum(c.cast(DecimalType(30, 10))).cast("double") / count(lit(1)), 4) + 0.0

  /** Order-independent NULL-excluded mean: exact decimal sum over non-null
    * inputs / count of non-null inputs, rounded to 4 dp. Matches SQL AVG
    * null semantics (davg divides by COUNT(*), which differs when the
    * input is nullable — e.g. a LEFT-JOINed per-doc signal). */
  def davgNN(c: Column): Column =
    round(sum(c.cast(DecimalType(30, 10))).cast("double") / count(c), 4) + 0.0

  /** Round any double expression to 4 dp (for per-row or small-window math
    * where both engines compute bit-identical doubles). */
  def d4(c: Column): Column = round(c, 4) + 0.0

  /** DuckDB oracle twin of [[dsum]]. */
  def dsumSql(x: String): String =
    s"(ROUND(CAST(SUM(CAST($x AS DECIMAL(30,10))) AS DOUBLE), 4) + 0.0)"

  /** DuckDB oracle twin of [[davg]]. */
  def davgSql(x: String): String =
    s"(ROUND(CAST(SUM(CAST($x AS DECIMAL(30,10))) AS DOUBLE) / COUNT(*), 4) + 0.0)"

  /** DuckDB oracle twin of [[davgNN]]. */
  def davgNNSql(x: String): String =
    s"(ROUND(CAST(SUM(CAST($x AS DECIMAL(30,10))) AS DOUBLE) / COUNT($x), 4) + 0.0)"

  /** DuckDB twin of [[d4]]. */
  def d4Sql(x: String): String = s"(ROUND($x, 4) + 0.0)"
}
