package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-point) join: match each point to every interval of the
  * same key that contains it (`start <= ts <= end`). Spark's only native
  * plan for an inequality join is BroadcastNestedLoop / cartesian-per-key
  * — quadratic the moment the small side stops being small.
  *
  * Scalable formulation: TIME BINNING. Intervals explode into the bins
  * they cover; each point maps to exactly ONE bin; candidates come from a
  * plain (key, bin) equi-join (shuffle co-partitioned, never a cross
  * product) and the exact containment predicate filters them. A
  * (point, interval) pair can meet in at most one bin — the point's — so
  * no dedup pass is needed. Pick `binSeconds` on the order of the maximum
  * interval length: the interval blow-up factor is len/bin + 1, and the
  * candidate count per point is the number of interval-bins it shares —
  * both bounded, both tunable, 100 TB-safe.
  *
  * Column names of `points` and `intervals` must be disjoint apart from
  * `key` (standard for a two-sided operator; the catalog entry shows the
  * shape).
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      key: String, ts: String, startCol: String, endCol: String,
      binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    def binOf(c: org.apache.spark.sql.Column) =
      floor(unix_micros(c.cast("timestamp")) / binUs)
    val p = points.withColumn("__bin", binOf(col(ts)))
    val i = intervals.withColumn("__bin",
      explode(sequence(binOf(col(startCol)), binOf(col(endCol)))))
    p.join(i, Seq(key, "__bin"))
      .filter(col(ts) >= col(startCol) && col(ts) <= col(endCol))
      .drop("__bin")
  }
}
