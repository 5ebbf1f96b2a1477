package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Unicode normalization (NFC/NFD/NFKC/NFKD) — the
  * canonicalization step every text-dedup pipeline runs BEFORE hashing,
  * and one Spark has no built-in for (the usual fallback is a Scala UDF,
  * which breaks whole-stage codegen and serializes a boxed String per
  * row). The visible effect dedup cares about: the same glyph can arrive
  * as a precomposed code point (U+00E9 "é") or a base letter plus a
  * combining mark (U+0065 U+0301) — byte-distinct, render-identical, so
  * exact-hash dedup and shingle fingerprints silently treat equal texts
  * as different until normalization folds them to one form.
  *
  * Two determinism notes. (1) The fast path: `Normalizer.isNormalized`
  * is a scan without allocation, and real-world corpora are
  * overwhelmingly already-NFC (ASCII trivially so) — the common row
  * costs one scan and returns the input UTF8String unchanged. (2) The
  * form is a compile-time literal spliced into both eval paths, so the
  * interpreted and generated code call the exact same JDK routine —
  * GraftProperties pins the algebraic laws (idempotence, NFD/NFC
  * confluence) on arbitrary strings via interpreted eval, and OpsSpec
  * pins the codegen'd DataFrame path against the JDK routine applied
  * driver-side.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.forms.contains(form),
    s"normalization form must be one of ${UnicodeNormalize.forms.mkString("/")}, got $form")

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_unicode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  private lazy val javaForm = Normalizer.Form.valueOf(form)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val str = s.toString
    if (Normalizer.isNormalized(str, javaForm)) s
    else UTF8String.fromString(Normalizer.normalize(str, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized(
         |    $str, java.text.Normalizer.Form.$form)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($str, java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")
}
