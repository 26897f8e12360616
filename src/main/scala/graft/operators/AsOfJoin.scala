package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS OF join: for each left row, attach the single right row with the
  * largest (backward) / smallest (forward) ordering-key value that is
  * ≤ / ≥ the left row's ordering key, within equal partition keys.
  *
  * Semantics follow the reference's MSE ASOF join
  * (apache/pinot `pinot-query-runtime/.../operator/AsofJoinOperator.java:37`,
  * match conditions `:137-163`, ASOF + LEFT ASOF `:169-170`). Ties on the
  * right ordering key are nondeterministic in the reference (`:82`); here we
  * make them deterministic by preferring the later-seen right row in sort
  * order.
  *
  * Implementation — the "union trick", chosen for 100 TB scale:
  * tag both inputs, union them, then one window pass per partition key
  * ordered by (orderKey, side) carrying the last non-null right payload
  * forward. Cost = ONE shuffle by the partition key + ONE sort within
  * partitions — same shape as a sort-merge join, no per-row range probe,
  * no broadcast requirement, no row explosion. Skew on the partition key
  * is handled by AQE the same way a sort-merge join's would be.
  */
object AsOfJoin {

  /** Broadcast variant: when the right side is small (dimension-like —
    * rates, config versions), group it into per-key SORTED arrays,
    * broadcast-join on the partition key, and pick the last element at
    * or before the left ordering key with array HOFs. The left (fact)
    * side is NEVER shuffled — the as-of analog of a broadcast hash
    * join, the right plan shape when the left is 100 TB and the right
    * is megabytes. Semantics identical to [[asofJoin]] backward mode.
    */
  def asofJoinBroadcast(
      left: DataFrame,
      right: DataFrame,
      partitionKeys: Seq[String],
      leftOrder: String,
      rightOrder: String,
      allowExact: Boolean = true,
      joinType: String = "left",
      rightPrefix: String = "r_"): DataFrame = {
    val payloadCols = right.columns.filterNot(partitionKeys.contains)
    val packed = right.groupBy(partitionKeys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        (col(rightOrder).as("__ord") +:
          payloadCols.map(c => col(c).as(c))): _*))).as("__asof_arr"))

    val joined = left.join(broadcast(packed), partitionKeys, "left")
    val lOrd = col(leftOrder)
    val matches = filter(col("__asof_arr"), e =>
      if (allowExact) e.getField("__ord") <= lOrd else e.getField("__ord") < lOrd)
    val matched = joined.withColumn("__asof_match",
      when(size(matches) > 0, element_at(matches, -1)))
    val filtered =
      if (joinType == "inner") matched.filter(col("__asof_match").isNotNull)
      else matched
    val withRight = payloadCols.foldLeft(filtered) { (df, c) =>
      df.withColumn(rightPrefix + c, col("__asof_match").getField(c))
    }
    withRight.drop("__asof_arr", "__asof_match")
  }

  /** @param allowExact  if true, a right row at exactly the same orderKey
    *                    value can match (>= / <=); if false, strict.
    * @param direction   "backward" (right.orderKey <= left.orderKey, the
    *                    common as-of) or "forward".
    * @param joinType    "inner" (drop unmatched left rows) or "left".
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      partitionKeys: Seq[String],
      leftOrder: String,
      rightOrder: String,
      direction: String = "backward",
      allowExact: Boolean = true,
      joinType: String = "left",
      rightPrefix: String = "r_"): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)
    require(joinType == "left" || joinType == "inner", joinType)

    val rightPayloadCols = right.columns.filterNot(partitionKeys.contains)
    val payload = struct(rightPayloadCols.map(col): _*).as("__asof_payload")

    // side: right rows must sort BEFORE equal-key left rows when exact
    // matches are allowed, AFTER when strict.
    val rightSide = lit(if (allowExact) 0 else 2)
    val r = right.select(
      partitionKeys.map(col) ++ Seq(
        col(rightOrder).as("__asof_ord"),
        rightSide.as("__asof_side"),
        payload): _*)
    val l = left.withColumn("__asof_ord", col(leftOrder))
      .withColumn("__asof_side", lit(1))
      .withColumn("__asof_payload", lit(null).cast(r.schema("__asof_payload").dataType))

    val unioned = l.select(
      (left.columns.map(col) :+ col("__asof_ord") :+ col("__asof_side") :+ col("__asof_payload")): _*)
      .unionByName(
        r.select(
          partitionKeys.map(col) ++
            left.columns.filterNot(c => partitionKeys.contains(c)).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
            Seq(col("__asof_ord"), col("__asof_side"), col("__asof_payload")): _*))

    val ord: Seq[Column] = direction match {
      case "backward" => Seq(col("__asof_ord").asc, col("__asof_side").asc)
      // forward as-of = backward scan from the other end
      case "forward" => Seq(col("__asof_ord").desc, col("__asof_side").asc)
    }
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1) // keep only left rows

    val filtered =
      if (joinType == "inner") matched.filter(col("__asof_match").isNotNull) else matched
    val withRight = rightPayloadCols.foldLeft(filtered) { (df, c) =>
      df.withColumn(rightPrefix + c, col("__asof_match").getField(c))
    }
    withRight.drop("__asof_ord", "__asof_side", "__asof_payload", "__asof_match")
  }
}
