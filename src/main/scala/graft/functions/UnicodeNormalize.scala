package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization over a string column — the first
  * stage of any text-curation pipeline (byte-identical text must
  * compare equal before dedup hashing, and composed/decomposed
  * accents or compatibility ligatures otherwise defeat exact and
  * shingle dedup alike).
  *
  * Spark has no built-in normalizer and the no-UDF rule holds, so
  * this is a codegen'd UnaryExpression around `java.text.Normalizer`.
  * The `form` is bound at plan time (NFC/NFD/NFKC/NFKD). Hot path for
  * 100 TB corpora: `Normalizer.isNormalized` runs the quick-check
  * first (pure-ASCII and already-normalized text — the overwhelming
  * majority — never allocates; the input UTF8String is returned
  * as-is).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects a string, got ${child.dataType.sql}")
    else if (!UnicodeNormalize.Forms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize form must be one of " +
          s"${UnicodeNormalize.Forms.keys.mkString(", ")}, got '$form'")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val f = UnicodeNormalize.Forms(form)

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], f)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", f, "java.text.Normalizer.Form")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnicodeNormalize.normalize($s, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  /** Shared by interpreted eval and codegen. Quick-check fast path:
    * already-normalized input (incl. all pure-ASCII) is returned
    * without copying. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column-API entry points. */
  def nfc_normalize(c: Column): Column = normalize(c, "NFC")
  def normalize(c: Column, form: String): Column =
    GraftColumnBridge.column(
      UnicodeNormalize(GraftColumnBridge.expression(c), form))
}
