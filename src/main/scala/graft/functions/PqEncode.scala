package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** Structural input validation shared by the two PQ expressions: a
  * mistyped input (float arrays, wrong nesting, missing struct field)
  * previously sailed through an unconditional TypeCheckSuccess and
  * surfaced as a ClassCastException inside generated code at execution
  * time (round-15 ADVICE); these helpers turn it into an analysis-time
  * error with the expected shape spelled out. Shapes are checked by
  * POSITION and element type — field names are caller-chosen labels. */
private[functions] object PqTypeCheck {
  /** `array<double>` (any nullability). */
  def doubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true; case _ => false
  }
  /** `array<bigint>` (any nullability). */
  def longArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true; case _ => false
  }
  /** `array<struct<_:bigint, _:<second>>>` — the (code, payload) entry
    * list both nested inputs are built from. */
  def entryList(t: DataType)(second: DataType => Boolean): Boolean = t match {
    case ArrayType(StructType(fs), _) =>
      fs.length == 2 && fs(0).dataType == LongType && second(fs(1).dataType)
    case _ => false
  }
  def failure(name: String, pos: String, expected: String,
      actual: DataType): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(
      s"$name requires the $pos input to be $expected, got ${actual.sql}")
}

/** Native product-quantization encoder: all subspace codes of one
  * vector in a single fused evaluation.
  *
  * The composed alternative (q252's previous encode:
  * `transform(sequence(0,15), sub => aggregate(entries, ...))` with an
  * exact-decimal `zip_with` fold per (subspace, code) candidate) is
  * semantically identical, but higher-order functions are interpreted
  * per-row — the corpus-side encode evaluated 160 lambda-driven decimal
  * folds per vector (~320k interpreted folds at sf0.1, profiled at
  * ~2.1 s of the query's 3.3 s). This expression does the same argmin
  * in one compiled loop and participates in whole-stage codegen.
  *
  * Arithmetic is BIT-IDENTICAL to the fold it replaces (and therefore
  * to the DuckDB oracle the hash gate proves): each squared-diff term
  * is computed in double and rounded to 10 dp exactly as Spark's
  * `Cast(double → decimal(30,10))` does (`BigDecimal.valueOf`, i.e. the
  * shortest decimal representation, then HALF_UP at scale 10 — [[term10]]);
  * terms accumulate EXACTLY as a scale-10 unscaled long (four bounded
  * terms can't overflow); the sum converts to double and rounds to 4 dp
  * with the same HALF_UP rule as Spark's `round(_, 4)`; and the argmin
  * scans candidates in ascending code order keeping the incumbent on
  * ties — `min_by(struct(dist, code))` / the oracle's
  * `ORDER BY dist, code` tie-break.
  *
  * Left input: the vector, `array<double>` of length subspaces×subDim.
  * Right input: the codebook as ONE nested literal-like value (KB-sized
  * at any corpus scale — k×subspaces is a model constant, broadcast via
  * a one-row cross join): `array<array<struct<code:bigint,
  * cv:array<double>>>>`, outer index = subspace, entries sorted by code.
  * Returns `array<bigint>`: the chosen code per subspace.
  *
  * No-winner contract: when EVERY candidate in a subspace yields a
  * NaN/overflow distance (a garbage codebook — non-finite centroids, or
  * squared diffs past decimal(30,10) everywhere), the emitted code is
  * the explicit sentinel **-1**. The replaced fold surfaced a NULL
  * element there; this expression declares `containsNull = false` so
  * downstream consumers (the ADC code lookup, the oracle's equi-join)
  * never branch on null — and -1 cannot collide with a real code (codes
  * are non-negative by construction, and [[PqAdcScores]] finds no LUT
  * entry for -1, so the subspace is SUM-skipped exactly like the fold's
  * null). OperatorUnitSpec pins the sentinel.
  */
case class PqEncodeCodes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    import PqTypeCheck._
    val cbOk = right.dataType match {
      case ArrayType(inner, _) => entryList(inner)(doubleArray)
      case _ => false
    }
    if (!doubleArray(left.dataType))
      failure(prettyName, "vector (left)", "array<double>", left.dataType)
    else if (!cbOk)
      failure(prettyName, "codebook (right)",
        "array<array<struct<code:bigint, cv:array<double>>>>", right.dataType)
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqEncodeHelper.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqEncodeHelper.encode($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeCodes =
    copy(left = newLeft, right = newRight)
}

/** Static evaluation core shared by interpreted eval and generated code
  * (a top-level object gets a static forwarder class, so generated Java
  * calls it directly). */
object PqEncodeHelper {

  /** HALF_UP(|v|·10^s) via double arithmetic when PROVABLY equal to the
    * BigDecimal string path, -1 when the boundary guard trips. The
    * decimal value Spark rounds is the shortest representation of v
    * (|repr − v| ≤ ulp/2) and the double product fl(|v|·10^s) adds
    * another ≤ ulp/2, so for x < 1e13 the product sits within 0.0022 of
    * the true scaled decimal — when its fractional part is ≥ 0.01 away
    * from the 0.5 rounding boundary, floor/ceil agrees with HALF_UP
    * exactly (near 0/1 the crossing changes floor and the rounded HALF
    * in lockstep). Real data lands in the guard band ~2% of the time;
    * those values take the exact BigDecimal path. */
  private[graft] def fastAbsScaled(a: Double, pow10: Double): Long = {
    val x = a * pow10
    if (x < 1e13) {
      val f = Math.floor(x)
      val frac = x - f
      if (Math.abs(frac - 0.5) > 0.01)
        return (if (frac > 0.5) f + 1.0 else f).toLong
    }
    -1L
  }

  /** `Cast(double → decimal(30,10))`'s exact rounding, as a scale-10
    * unscaled long: BigDecimal.valueOf (shortest decimal representation,
    * matching Spark's `Decimal.set(Double)`) then HALF_UP at scale 10 —
    * through [[fastAbsScaled]] off the boundary band. Inputs (squared
    * diffs, 4-dp LUT weights) sit far below the ~9.2e8 bound where the
    * unscaled value would leave the long range. */
  private[graft] def term10(t: Double): Long = {
    val a = Math.abs(t)
    val fast = fastAbsScaled(a, 1e10)
    if (fast >= 0L) return if (t < 0) -fast else fast
    java.math.BigDecimal.valueOf(t)
      .setScale(10, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
  }

  /** Spark `round(x, 4) + 0.0`: HALF_UP at 4 dp, then the nearest
    * double of that 4-dp decimal (IEEE division by the exactly-
    * representable 1e4 is correctly rounded, so `r / 1e4` IS
    * `BigDecimal.valueOf(r, 4).doubleValue()`). */
  private[graft] def round4(x: Double): Double = {
    val a = Math.abs(x)
    val fast = fastAbsScaled(a, 1e4)
    if (fast >= 0L) return (if (x < 0) -fast else fast) / 1e4 + 0.0
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .doubleValue() + 0.0
  }

  /** `Decimal(acc, scale 10).toDouble`: the nearest double of
    * acc·10^-10. For |acc| < 2^53 the long converts exactly and IEEE
    * division by the exactly-representable 1e10 is correctly rounded —
    * the same nearest-of-exact value BigDecimal returns. */
  private[graft] def unscale10(acc: Long): Double =
    if (Math.abs(acc) < (1L << 53)) acc / 1e10
    else java.math.BigDecimal.valueOf(acc, 10).doubleValue()

  /** Exact candidate distance via BigDecimal for inputs outside the
    * long fold's safe range; returns NaN — which never wins the argmin,
    * exactly like the replaced fold's NULL dist — when a term is
    * non-finite or any value exceeds decimal(30,10)'s 20 integer
    * digits (Spark's non-ANSI Cast produces null there, and a null
    * term poisons the whole `aggregate` fold). */
  private def distSlow(fv: ArrayData, base: Int, cv: ArrayData): Double = {
    var acc = java.math.BigDecimal.ZERO
    val k = cv.numElements()
    var i = 0
    while (i < k) {
      val d = fv.getDouble(base + i) - cv.getDouble(i)
      val t = d * d
      if (java.lang.Double.isNaN(t) || java.lang.Double.isInfinite(t))
        return Double.NaN
      val td = java.math.BigDecimal.valueOf(t)
        .setScale(10, java.math.RoundingMode.HALF_UP)
      if (td.precision - 10 > 20) return Double.NaN
      acc = acc.add(td)
      i += 1
    }
    if (acc.precision - 10 > 20) Double.NaN
    else round4(acc.doubleValue())
  }

  def encode(fv: ArrayData, cb: ArrayData): ArrayData = {
    val nSub = cb.numElements()
    val out = new Array[Long](nSub)
    var sub = 0
    while (sub < nSub) {
      val entries = cb.getArray(sub)
      val m = entries.numElements()
      var best = Double.MaxValue
      var bestCode = -1L
      var j = 0
      while (j < m) {
        val e: InternalRow = entries.getStruct(j, 2)
        val cv = e.getArray(1)
        val k = cv.numElements()
        // long-fold safety is a function of the TERM COUNT (round-15
        // ADVICE: a fixed 1e8 bound was only safe for k <= 9 — k
        // near-bound terms of up to 1e18 unscaled wrap Long.MaxValue
        // ~9.2e18 silently past that, producing wrong distances and
        // wrong argmin codes; common PQ configs use 8/16-dim
        // subspaces): k terms, each |t|·1e10 unscaled, must sum inside
        // a Long — t < 8e8/k keeps the total ≤ 8e18 < 2^63 for any
        // NON-EMPTY subspace dimension, mirroring adcScores' wGuard.
        // k == 0 (an empty centroid array — a degenerate codebook
        // entry) is handled below as a NaN no-winner candidate: the
        // zero-iteration fold would otherwise yield dist 0.0 and STEAL
        // the argmin from every real centroid (round-19 ADVICE), where
        // the documented contract treats garbage entries like the NaN
        // case — they lose, and an all-garbage subspace emits the -1
        // sentinel.
        val tGuard = 8.0e8 / k
        var acc = 0L // exact: sum of scale-10 unscaled terms
        var slow = false
        var i = 0
        while (i < k && !slow) {
          val d = fv.getDouble(sub * k + i) - cv.getDouble(i)
          val t = d * d
          // stay on the long fold only while PROVABLY safe;
          // NaN/Infinity fail this comparison too, so garbage inputs
          // degrade to [[distSlow]] instead of throwing (round-15
          // review: valueOf(NaN) / longValueExact threw where the
          // replaced decimal fold yielded a null dist)
          if (t < tGuard) { acc += term10(t); i += 1 } else slow = true
        }
        val dist =
          if (k == 0) Double.NaN // empty centroid: no-winner, never 0.0
          else if (slow) distSlow(fv, sub * k, cv)
          else round4(unscale10(acc))
        // a NaN dist never wins — the fold's null-dist candidates lost
        // the argmin the same way
        if (dist < best) { best = dist; bestCode = e.getLong(0) }
        j += 1
      }
      out(sub) = bestCode
      sub += 1
    }
    new GenericArrayData(out)
  }

  def adcScores(codes: ArrayData, lut: ArrayData): ArrayData = {
    val nQ = lut.numElements()
    val nSub = codes.numElements()
    val out = new Array[Any](nQ)
    var q = 0
    while (q < nQ) {
      val qe: InternalRow = lut.getStruct(q, 2)
      val qlut = qe.getArray(1)
      var acc = 0L // exact: sum of scale-10 unscaled w terms
      // big/garbage inputs leave the long fold: SQL SUM semantics —
      // a NULL/uncastable term is SKIPPED, all-skipped yields NULL
      // (round-15 review: the fast path previously threw on them)
      // long-fold safety is a function of the TERM COUNT: nSub terms,
      // each |w|·1e10 unscaled, must sum inside Long — w < 8e8/nSub
      // keeps the total ≤ 8e18 < 2^63 for any subspace count
      val wGuard = 8.0e8 / math.max(nSub, 1)
      var bigAcc: java.math.BigDecimal = null
      var contributed = 0
      var sub = 0
      while (sub < nSub) {
        val entries = qlut.getArray(sub)
        val code = codes.getLong(sub)
        val m = entries.numElements()
        var j = 0
        var found = false
        while (j < m && !found) {
          val e = entries.getStruct(j, 2)
          if (e.getLong(0) == code) {
            found = true
            if (!e.isNullAt(1)) {
              val w = e.getDouble(1)
              if (!java.lang.Double.isNaN(w) &&
                  !java.lang.Double.isInfinite(w)) {
                if (bigAcc == null && math.abs(w) < wGuard) {
                  acc += term10(w); contributed += 1
                } else {
                  if (bigAcc == null)
                    bigAcc = java.math.BigDecimal.valueOf(acc, 10)
                  val td = java.math.BigDecimal.valueOf(w)
                    .setScale(10, java.math.RoundingMode.HALF_UP)
                  // Cast overflow -> null term -> skipped by SUM
                  if (td.precision - 10 <= 20) {
                    bigAcc = bigAcc.add(td); contributed += 1
                  }
                }
              }
            }
          }
          j += 1
        }
        sub += 1
      }
      val score: Any =
        if (contributed == 0) null // SUM over zero non-null terms
        else if (bigAcc == null) round4(unscale10(acc))
        // SUM(decimal(30,10)) accumulates into decimal(38,10) — 28
        // integer digits, not the per-TERM cast's 20 (round-15 ADVICE:
        // per-term-valid weights summing into (1e20, 1e28) are a real
        // value on both engines; nulling at 20 diverged from dsum)
        else if (bigAcc.precision - 10 > 28) null // sum overflow -> null
        else round4(bigAcc.doubleValue())
      out(q) = InternalRow(qe.getLong(0), score)
      q += 1
    }
    new GenericArrayData(out)
  }
}

object PqEncodeCodes {
  /** Column-API entry point. */
  def codes(fv: Column, cb: Column): Column =
    GraftBridge.column(
      PqEncodeCodes(GraftBridge.expression(fv), GraftBridge.expression(cb)))
}

/** Native ADC (asymmetric distance computation) scorer: given one
  * vector's subspace codes and the broadcast query LUT, the per-query
  * ADC scores in a single fused evaluation.
  *
  * The composed alternative — explode the codes to (vec, sub, code)
  * rows, equi-join the LUT on (sub, code), and decimal-sum 16 partial
  * dot products per (query, vec) — multiplies the corpus by
  * queries×subspaces through a shuffle-bound aggregate (profiled at
  * ~1.1 s of q252's 2.0 s for 320k joined rows at sf0.1). But the LUT,
  * like the codebook, is a MODEL CONSTANT (queries×subspaces×k
  * entries), so the scoring is a map-side lookup: this expression scans
  * it once per vector and emits `array<struct<query_id:bigint,
  * adc_score:double>>` — the corpus never expands and nothing but the
  * (vec, query, score) result leaves the stage.
  *
  * Arithmetic matches [[graft.functions.det.dsum]] bit-for-bit: each w
  * (already a 4-dp-rounded double) is cast to decimal(30,10) exactly as
  * Spark's Cast does ([[PqEncodeHelper.term10]]'s valueOf + HALF_UP at
  * scale 10), the 16 terms accumulate exactly as scale-10 unscaled
  * longs, and the sum converts to double and rounds to 4 dp HALF_UP
  * (`round(_, 4) + 0.0`, -0.0 normalized — scores can be negative).
  *
  * Left input: `array<bigint>` codes ([[PqEncodeCodes]]' output, index =
  * subspace). Right input: the LUT as one nested value:
  * `array<struct<query_id:bigint, qlut:array<array<
  * struct<code:bigint, w:double>>>>>` — per query, per subspace, the
  * (code, w) entries in ascending code order.
  */
case class PqAdcScores(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    // nullable: SUM-over-zero-contributing-terms / overflow yields a
    // NULL score, mirroring the dsum it replaces
    StructField("adc_score", DoubleType, nullable = true))),
    containsNull = false)

  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult = {
    import PqTypeCheck._
    // per query: struct<_:bigint, _:array<array<struct<_:bigint, _:double>>>>
    val lutOk = right.dataType match {
      case ArrayType(StructType(fs), _) =>
        fs.length == 2 && fs(0).dataType == LongType &&
          (fs(1).dataType match {
            case ArrayType(inner, _) =>
              entryList(inner)(_ == DoubleType)
            case _ => false
          })
      case _ => false
    }
    if (!longArray(left.dataType))
      failure(prettyName, "codes (left)", "array<bigint>", left.dataType)
    else if (!lutOk)
      failure(prettyName, "LUT (right)",
        "array<struct<query_id:bigint, qlut:array<array<struct<code:bigint, w:double>>>>>",
        right.dataType)
    else TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    PqEncodeHelper.adcScores(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqEncodeHelper.adcScores($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScores =
    copy(left = newLeft, right = newRight)
}

object PqAdcScores {
  /** Column-API entry point. */
  def scores(codes: Column, lut: Column): Column =
    GraftBridge.column(
      PqAdcScores(GraftBridge.expression(codes), GraftBridge.expression(lut)))
}
