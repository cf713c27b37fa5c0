package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Canonicalization helpers for oracle (DuckDB) hash-parity.
  *
  * Floating-point summation order varies across shuffle partitions, so a
  * plain `sum(double)` is not reproducible between Spark's partial/final
  * aggregation and DuckDB's sequential scan. Casting each addend to an
  * exact DECIMAL before summing makes the sum order-independent and
  * bit-identical in both engines; the final cast back to DOUBLE is exact
  * for our magnitudes. This mirrors the determinism discipline of the
  * reference's dedup/exactly-once machinery
  * (celeborn: client/src/main/java/org/apache/celeborn/client/read/CelebornInputStream.java:864-899),
  * re-expressed at the numeric level.
  */
object Canon {
  /** Order-independent sum of a double column: exact decimal accumulate,
    * result as double. `scale` must cover the addends' decimal places. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Deterministic average: exact decimal sum divided by count, rounded.
    * (Spark's avg(double) merges partial sums in partition order — not
    * reproducible against a sequential oracle.) */
  def davg(c: Column, scale: Int = 2, outScale: Int = 4): Column =
    round(dsum(c, scale) / count(lit(1)), outScale)

  /** SQL fragment equivalents for the DuckDB oracle side. */
  def sqlDsum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(28,$scale))) AS DOUBLE)"
  def sqlDavg(expr: String, scale: Int = 2, outScale: Int = 4): String =
    s"ROUND(${sqlDsum(expr, scale)} / COUNT(*), $outScale)"
}
