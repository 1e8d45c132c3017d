package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * codegen'd expression — the text-cleaning step a multilingual corpus
  * runs before hashing/dedup, because canonically-equivalent strings
  * (composed é vs e + COMBINING ACUTE) otherwise hash apart and the
  * same document dedups as two. Backed by `java.text.Normalizer`
  * (the JDK's ICU-derived UAX #15 implementation); DuckDB's
  * `nfc_normalize` implements the same algorithm, so normalized bytes
  * are identical cross-engine — the n125 oracle hash-compares them.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"${ev.value} = graft.functions.NfcNormalize$$.MODULE$$.nfc($str);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan and most real
    // text is already NFC — skip the rebuild (and its allocation)
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
