package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark lacks as built-ins, composed from
 * existing ops so Catalyst keeps optimizing around them (preference
 * (a) of the custom-operator ladder — no custom plan node needed).
 *
 * Both operators are designed for the 100 TB shape of the problem:
 *  - `asof` is a union + one hash shuffle on the key + a linear
 *    running-window scan per key partition. No per-row range probe,
 *    no range-condition nested-loop join, no explosion: cost is
 *    O((|L| + |R|) log) regardless of how many right rows precede
 *    each left row.
 *  - `bandedSelfPairs` buckets time into `band`-sized cells and
 *    equi-joins on (key, cell) with a 3-cell candidate explode on one
 *    side, so candidate generation is a hash shuffle with bounded
 *    fan-out instead of the quadratic per-key cross product a naive
 *    |t_a - t_b| <= band predicate plans as.
 */
object Joins {

  /**
   * As-of join: for every left row, attach the payload of the LATEST
   * right row with the same key and `rTime <= lTime` (ties on time
   * resolved toward the larger `rTie`; left rows with no prior right
   * row get a null payload struct).
   *
   * Mechanics: both sides are tagged and unioned (right side = 0 so
   * it sorts before left rows at the same instant), then a running
   * `last(payload, ignoreNulls)` over (key ORDER BY time, side, tie)
   * carries the newest right payload forward onto each left row.
   *
   * @param payload right-side columns to carry (returned as a struct
   *                column named `asof`, null when nothing matched)
   */
  def asof(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String, rTie: String,
      payload: Seq[String]): DataFrame = {
    val r2 = right.select(
      col(rKey).as("_k"), col(rTime).as("_t"), lit(0).as("_side"),
      col(rTie).cast("long").as("_tie"),
      struct(payload.map(col): _*).as("asof"))
    val l2 = left
      .withColumn("_k", col(lKey))
      .withColumn("_t", col(lTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("asof", lit(null).cast(r2.schema("asof").dataType))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("asof", last(col("asof"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .drop("_k", "_t", "_side", "_tie")
  }

  /**
   * All same-key row pairs within `band` time units of each other,
   * emitted once as (id_a < id_b).
   *
   * Each row lands in time cell floor(t / band); row pairs within
   * `band` of each other are at most one cell apart, so the left side
   * explodes to its cell ±1 and a plain equi-join on (key, cell)
   * generates every candidate exactly once (the single cell value
   * equal to the right row's cell). The band predicate then filters
   * exactly.
   */
  def bandedSelfPairs(df: DataFrame, key: String, id: String, time: String,
      band: Long): DataFrame = {
    val cell: Column = floor(col("t_a") / band)
    val a = df.select(col(key).as("k"), col(id).as("id_a"), col(time).as("t_a"))
      .withColumn("cell", explode(array(cell - 1, cell, cell + 1)))
    val b = df.select(col(key).as("k"), col(id).as("id_b"), col(time).as("t_b"),
      floor(col(time) / band).as("cell"))
    a.join(b, Seq("k", "cell"))
      .where(col("id_a") < col("id_b") &&
        abs(col("t_b") - col("t_a")) <= band)
      .drop("cell")
  }
}
