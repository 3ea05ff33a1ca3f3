package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-earlier) join: for each left row, the latest right row
  * with `rightTs <= leftTs` within the same key — the standard temporal
  * join for "state at event time" lookups (prices at trade time, last
  * login before purchase, ...).
  *
  * Spark has no native as-of join; rather than a custom SparkPlan, this
  * composes built-ins (the preference order in SURVEY §7.3): tag and
  * UNION both sides, then a per-key `last(_, ignoreNulls)` running window
  * ordered by (ts, side) carries the most recent right payload onto each
  * left row. One shuffle on the key — same cost class a native
  * merge-as-of would pay — and everything stays inside Catalyst's
  * window machinery (AQE, spill, codegen).
  *
  * Right rows sort BEFORE left rows at equal timestamps, so a match at
  * exactly leftTs == rightTs is included (ASOF >= semantics, matching
  * DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).
  */
object AsOf {

  /** @param left        left side; all its columns are kept
    * @param right       right side; only `rightPayload` columns are carried
    * @param key         equi-join key column name (present on both sides)
    * @param leftTs      left event-time column name
    * @param rightTs     right event-time column name
    * @param rightPayload right columns to attach (renamed as given)
    * @param joinType    "inner" drops left rows with no earlier right row;
    *                    "left" keeps them with null payload
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPayload: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left", s"unsupported: $joinType")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val lPadded = rightPayload.foldLeft(l)((df, c) =>
      df.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val r0 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
    val rPadded = leftCols.foldLeft(
      rightPayload.foldLeft(r0)((df, c) => df.withColumn(s"__r_$c", col(c))))(
      (df, c) => if (df.columns.contains(c)) df else
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select((leftCols ++ Seq("__ts", "__side") ++ rightPayload.map(c => s"__r_$c"))
        .map(col): _*)
    val u = lPadded
      .select((leftCols ++ Seq("__ts", "__side") ++ rightPayload.map(c => s"__r_$c"))
        .map(col): _*)
      .unionByName(rPadded)
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(u)((df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))
    val onlyLeft = carried.filter(col("__side") === 1)
    val matchedFilter =
      if (joinType == "inner")
        rightPayload.map(c => col(s"__m_$c").isNotNull).reduce(_ || _)
      else lit(true)
    onlyLeft.filter(matchedFilter)
      .select((leftCols.map(col) ++
        rightPayload.map(c => col(s"__m_$c").as(c))): _*)
  }
}
