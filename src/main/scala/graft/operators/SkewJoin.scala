package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 / builder brief).
  *
  * A hash-partitioned join sends every row of a hot key to one task; at
  * 100 TB one pathological key (null station id, a bot user_id) stalls
  * the stage. Salting splits each hot key across `saltFactor` tasks:
  * the big side gets a random-but-deterministic salt in [0, factor),
  * the small side is exploded `factor`× so every (key, salt) bucket
  * can still match. Join output is bit-identical to the unsalted join
  * (verified by the j6 oracle) at `factor`× the small side's volume —
  * the classic trade.
  *
  * AQE's skew-join handles sort-merge skew automatically when splits
  * align with partition boundaries; explicit salting remains the tool
  * when the skew is one single key or the join is broadcast-unfriendly.
  */
object SkewJoin {

  /** Per-row salt in [0, saltFactor). A row-content hash is NOT enough:
    * the classic hot keys (null station id, a bot replaying one
    * payload) produce fully IDENTICAL rows, which all hash to the same
    * salt and still pile onto one task. `monotonically_increasing_id()`
    * — unique per row, partition-local, no coordination — already
    * separates duplicate rows on its own, so it is the ONLY hash
    * input: mixing the row columns in as well would re-hash the full
    * width of a 100 TB fact row per row for zero extra spread. The
    * salt never reaches the output (dropped after the join), and the
    * join result is salt-value-independent, so the id's
    * layout-dependence is harmless.
    *
    * @param df unused since the salt became row-content-independent;
    *           kept so call sites and the operator's signature stay
    *           stable if a content-mixing variant returns.
    */
  def saltColumn(df: DataFrame, saltFactor: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(saltFactor))

  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("graft__salt", saltColumn(big, saltFactor))
    val exploded = small
      .withColumn("graft__salt", explode(
        array((0 until saltFactor).map(lit): _*)))
    salted
      .join(exploded,
        salted(bigKey) === exploded(smallKey) &&
          salted("graft__salt") === exploded("graft__salt"))
      .drop("graft__salt")
  }
}
