package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the LATEST right
  * row with `right.ts <= left.ts` within the same key — the time-series
  * enrichment shape every training-data pipeline hits (attach the current
  * rate/model-version/config to each event). Spark has no native ASOF
  * join; composing one from a range join would be a quadratic per-key
  * cross product.
  *
  * Implementation is the scalable union-tag formulation: union both sides,
  * ONE shuffle by key, sort by (ts, side) within the key partition, and a
  * running `last(value, ignoreNulls)` window carries the most recent right
  * value forward onto left rows. Cost is shuffle + per-key sort —
  * identical shape to any windowed aggregate, no join explosion, and the
  * running-frame window evaluates incrementally (no per-row rescan).
  * Right rows order BEFORE left rows at equal ts, so a same-instant update
  * is visible (inclusive <=), matching DuckDB/kdb ASOF semantics.
  *
  * Right rows must be unique per (key, ts) for deterministic output —
  * pre-aggregate ties (the catalog entry does max()) before calling.
  */
object AsofJoin {

  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The union-tag formulation fills valueCols via a running window over
    // BOTH sides — if left already had a column named like a value column,
    // left's own values would silently act as fill sources. Enforce the
    // disjointness contract (RangeJoin documents the same requirement).
    val clash = leftCols.toSet.intersect(valueCols.toSet)
    require(clash.isEmpty,
      s"asofJoin: left columns must be disjoint from valueCols; clash: ${clash.mkString(", ")}")
    val l = left.withColumn("__asof_side", lit(1))
    val r = right.select((key +: ts +: valueCols).map(col): _*)
      .withColumn("__asof_side", lit(0))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__asof_side") === 1)
      .select((leftCols ++ valueCols).map(col): _*)
  }
}
