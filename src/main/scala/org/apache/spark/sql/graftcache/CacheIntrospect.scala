package org.apache.spark.sql.graftcache

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.columnar.InMemoryRelation

/** Lives under org.apache.spark.sql to reach `private[sql]` cache internals:
  * the only reliable way to map a DataFrame to the RDD actually holding its
  * cached blocks (a fresh `df.rdd` gets a new id every call, so matching
  * storage info by that id always misses).
  */
object CacheIntrospect {

  /** Ids of the cached-column-buffer RDDs backing `df`'s plan after cache
    * substitution; empty if no fragment of the plan is cached. Builds the
    * buffer RDD object lazily if needed — no job is triggered. */
  def cachedRddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.withCachedData.collect {
      case r: InMemoryRelation => r.cacheBuilder.cachedColumnBuffers.id
    }
}
