package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a native codegen expression.
  *
  * Why the engine needs it: canonical-equivalence duplicates defeat every
  * byte-level dedup primitive. "café" arrives from one crawler as the
  * composed code point U+00E9 and from another as "e" + combining acute
  * U+0301 — same rendered text, different bytes, so exact-hash dedup,
  * MinHash shingles and group-by keys all treat them as distinct
  * documents. A corpus pipeline normalizes to NFC once at ingest and
  * keys everything downstream on the normalized form (the W3C "early
  * normalization" discipline). Spark has no built-in normalizer
  * (`lower`/`trim` are unrelated; collation-aware comparison changes
  * JOIN semantics globally rather than producing a keyable value), so
  * this is the scalar-expression rung of the §2.10 ladder: a UDF would
  * work but breaks codegen and buries the null contract.
  *
  * Execution shape: participates in whole-stage codegen via a static
  * helper call (the [[PqEncodeCodes]] pattern). The hot path is the
  * ASCII fast path — `numBytes == numChars` means every byte is a
  * single-byte code point, and pure-ASCII text is NFC by construction,
  * so the overwhelming majority of a web corpus returns the INPUT
  * UTF8String untouched: zero copy, zero Java-String materialization.
  * Non-ASCII strings pay one `Normalizer.isNormalized` scan (already-NFC
  * text — most of the rest — allocates nothing but the probe) and only
  * genuinely denormalized text pays the compose pass. Null propagates
  * (standard UnaryExpression contract). Invalid UTF-8 passes through
  * byte-identical — never mangled to U+FFFD — so binary-ish text keeps
  * its raw-column dedup identity (see [[NfcNormalize.nfc]]).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** NFC-normalize one UTF8String; called from generated code. */
  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path: numBytes == numChars forces every byte < 0x80,
    // and ASCII contains no combining marks or composed forms, so the
    // string is its own NFC form — return it without copying.
    if (s.numBytes == s.numChars) return s
    // Invalid UTF-8 passes through BYTE-IDENTICAL (post-close review):
    // normalization is defined on Unicode text, and the implicit
    // alternative — s.toString replacing invalid bytes with U+FFFD on
    // the normalize path while the ASCII test let other invalid
    // patterns through verbatim — would mutate non-normalization
    // content inconsistently between paths. Garbage stays bytewise
    // intact, so byte-level dedup over the normalized column sees it
    // exactly as byte-level dedup over the raw column would.
    if (!s.isValid) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point: NFC normalization as a codegen'd native
    * expression. */
  def nfcCol(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
