package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join (an operator Spark lacks natively; the reference family's
  * time-series engines ship it built in), expressed by composing
  * built-ins per the brief's preference order: a BOUNDED range join plus
  * a keep-latest window.
  *
  * The tolerance bound is what makes this scale: without it the range
  * join fans out to each key's full history; with it fan-out is
  * proportional to right-rows-per-key-per-tolerance — exactly the bound
  * a native as-of SparkPlan would exploit. The equality key keeps the
  * join a hash/sort-merge join (never a nested loop), and the window
  * partitions on the left row id, so state per group is the bounded
  * candidate set.
  */
object AsOfJoin {

  /** For each left row, attach the LATEST right row with
    * `right.rightTs <= left.leftTs` within `tolerance`, matching on
    * `leftKey == rightKey`. Inner semantics: left rows with no match in
    * the window are dropped. Caller supplies disambiguated column names
    * (the frames are joined as-is); `rightTie` breaks exact-timestamp
    * ties deterministically.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftId: String, leftTs: String, rightTs: String,
      tolerance: String, rightTie: String): DataFrame = {
    val w = Window.partitionBy(col(leftId))
      .orderBy(col(rightTs).desc, col(rightTie))
    left.join(right,
        col(leftKey) === col(rightKey) &&
          col(rightTs) <= col(leftTs) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $tolerance"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
