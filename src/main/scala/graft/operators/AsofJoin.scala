package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the latest right row with
  * `right.ts <= left.ts` in the same key group. Spark has no native
  * as-of join; the scalable composition is the union + running-last
  * trick:
  *
  *   1. tag right rows kind=0 carrying (value, tiebreak), left rows
  *      kind=1 carrying the left payload;
  *   2. union; one window per key ordered by (ts, kind, tiebreak)
  *      computes last(value, ignoreNulls) over the preceding rows;
  *   3. keep the left rows — the carried value is the as-of match.
  *
  * Cost is ONE hash shuffle on the key plus a per-partition sort —
  * same shape as any windowed aggregate, no range-probe join blow-up,
  * no per-row binary search. Kind=0 sorts before kind=1 at equal
  * timestamps, so a right row at exactly left.ts matches (inclusive
  * bound). `tieBreak` makes equal-timestamp right rows deterministic
  * (the largest wins, matching a last_value window).
  *
  * At 100 TB: per-key data must fit a partition sort buffer — true for
  * real keys (events per user); a pathological hot key would take the
  * same salting treatment as SkewJoin.
  */
object AsofJoin {

  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightValue: String,
      rightTieBreak: String,
      outCol: String): DataFrame = {
    val vType = right.schema(rightValue).dataType
    val tbType = right.schema(rightTieBreak).dataType
    val leftStruct = struct(left.columns.map(col): _*)

    val l = left.select(
      col(key).as("graft__k"),
      col(leftTs).as("graft__ts"),
      lit(1).as("graft__kind"),
      lit(null).cast(vType).as("graft__v"),
      lit(null).cast(tbType).as("graft__tb"),
      leftStruct.as("graft__row"))
    val r = right.select(
      col(key).as("graft__k"),
      col(rightTs).as("graft__ts"),
      lit(0).as("graft__kind"),
      col(rightValue).cast(vType).as("graft__v"),
      col(rightTieBreak).cast(tbType).as("graft__tb"),
      lit(null).cast(l.schema("graft__row").dataType).as("graft__row"))

    val w = Window
      .partitionBy(col("graft__k"))
      .orderBy(col("graft__ts"), col("graft__kind"), col("graft__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(outCol, last(col("graft__v"), ignoreNulls = true).over(w))
      .filter(col("graft__kind") === 1)
      .select(col("graft__row.*"), col(outCol))
  }
}
