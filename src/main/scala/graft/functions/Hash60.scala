package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native portable 60-bit hash: string → first 15 hex digits of its
  * md5 as a BIGINT, bit-identical to the SQL spelling
  * `conv(substring(md5(x),1,15),16,10)` (= DuckDB
  * `('0x'||substr(md5(x),1,15))::UBIGINT::BIGINT`) — parity law-tested
  * in EngineLawsProps.
  *
  * The SQL spelling digests the bytes, renders 32 hex chars, substrings
  * 15 and parses them back — three string allocations per value on the
  * hottest hashing paths (shingle fingerprints, sampling residues,
  * winnowing). This expression reads the value straight off the digest
  * bytes (big-endian first 8 bytes >>> 4, via
  * [[SimHashSignature.hash60]]'s thread-local MessageDigest) and
  * participates in whole-stage codegen.
  */
case class Hash60(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def nullSafeEval(input: Any): Any =
    SimHashSignature.hash60(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      s"${ev.value} = graft.functions.SimHashSignature$$.MODULE$$.hash60($str.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}
