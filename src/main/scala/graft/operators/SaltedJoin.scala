package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join — the skew mitigation for a shuffle join whose key
  * distribution is pathological (a handful of keys hold most rows) and
  * whose small side is still too big to broadcast. AQE's skew-join split
  * (OptimizeSkewedJoin) handles sort-merge skew after the fact; salting
  * fixes the partitioning itself, which also covers the cases AQE cannot
  * touch (skewed keys feeding a downstream aggregation, or a join the
  * planner locked to shuffle-hash).
  *
  * Mechanics: every fact row gets a deterministic salt in [0, salts) that
  * varies WITHIN a key (derived from the full row content, not the key —
  * hashing the key alone would put each hot key back into one bucket);
  * the dimension side is replicated once per salt value. The join key
  * becomes (key, salt), so a key that held N rows now spreads over
  * `salts` partitions. Replication cost is |dim| × salts rows shuffled —
  * the knob to balance against the skew factor. Result is identical to
  * the unsalted join (inner/left semantics preserved: each fact row still
  * meets each matching dim row exactly once, on exactly one salt).
  */
object SaltedJoin {

  /** Inner-join `facts` with `dim` on `factKey = dimKey`, salted `salts`
    * ways. Column name collisions aside from the keys are the caller's
    * concern, as with a plain `join`. */
  def join(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    // __salt is this operator's scratch column: an input that already has
    // one would be silently hashed into the spread and then dropped.
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "input already has a __salt column; rename it before SaltedJoin.join")
    // Deterministic intra-key spread: hash the whole fact row. Duplicate
    // full rows share a salt, which only matters if the corpus is itself
    // one giant duplicated row — real skew comes from many distinct rows
    // per hot key, and those spread uniformly.
    val allCols = struct(facts.columns.map(col).toIndexedSeq: _*)
    val saltedFacts = facts.withColumn("__salt", pmod(xxhash64(allCols), lit(salts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFacts
      .join(replicatedDim,
        saltedFacts(factKey) === replicatedDim(dimKey) &&
          saltedFacts("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
