package graft

import scala.concurrent.{ExecutionContext, Future}

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The dfs_cache analogue (the fork's headline feature:
  * be/src/dfs_cache/dfs-cache.h — transparent local-disk LRU cache of
  * remote files, with a "Prepare" prefetch + progress-estimation API,
  * dfs-cache.h:86-145).
  *
  * On Spark the layered-storage role is played by the block manager:
  * `persist(MEMORY_AND_DISK)` gives exactly the reference's
  * remote→local-disk spill semantics, LRU eviction included — so the shim
  * is thin on purpose. What this object preserves from the reference is
  * the *API shape*: an async `prepare` (warm the cache ahead of queries)
  * and a `progress` estimate, which the reference exposed to let a
  * coordinator schedule work against warm data.
  */
object Caching {

  /** Register a dataset for cached access (remote parquet → local
    * memory/disk). Lazy, like dfsOpenFile: nothing is fetched yet. */
  def cached(df: DataFrame): DataFrame = df.persist(StorageLevel.MEMORY_AND_DISK)

  /** "Prepare" prefetch (dfs-cache.h:86-105): warm the cache in the
    * background; the returned future completes when fully materialized. */
  def prepare(df: DataFrame)(implicit ec: ExecutionContext): Future[Long] = {
    cached(df)
    Future { df.count() }
  }

  /** Progress estimation (dfs-cache.h:120-145): fraction of the dataset's
    * cached blocks already resident (memory or local disk). Resolves the
    * df's OWN InMemoryRelation buffer RDDs (via the plan after cache
    * substitution) — matching by `df.rdd.id` would miss every time and
    * read some unrelated cached RDD's stats. 0.0 if `df` isn't cached. */
  def progress(df: DataFrame): Double = {
    val ids = org.apache.spark.sql.graftcache.CacheIntrospect.cachedRddIds(df)
    if (ids.isEmpty) 0.0
    else {
      val statuses = df.sparkSession.sparkContext.getRDDStorageInfo
      val fracs = ids.map { id =>
        statuses.find(_.id == id)
          .map(i => i.numCachedPartitions.toDouble / math.max(i.numPartitions, 1))
          .getOrElse(0.0)
      }
      fracs.sum / fracs.size
    }
  }

  /** Cache residency statistics (cache-mgr.cc's space accounting):
    * bytes of this dataset currently held in memory and on local disk.
    * (0, 0) if `df` isn't cached or nothing has materialized yet. */
  def stats(df: DataFrame): (Long, Long) = {
    val ids = org.apache.spark.sql.graftcache.CacheIntrospect.cachedRddIds(df).toSet
    val infos = df.sparkSession.sparkContext.getRDDStorageInfo.filter(i => ids(i.id))
    (infos.map(_.memSize).sum, infos.map(_.diskSize).sum)
  }

  /** Drop from the cache (uncache/evict). */
  def release(df: DataFrame): Unit = df.unpersist()
}

/** Persist-policy advisor — the cache-manager ACCOUNTING role of the
  * reference's dfs_cache (be/src/dfs_cache/cache-mgr.h: an LRU file
  * cache with capacity planning and per-file access tracking; the
  * "which files deserve local disk" decision). On Spark the MECHANISM —
  * persist + BlockManager LRU eviction — already exists, so what was
  * left of the reference's feature was the POLICY: observe what a
  * workload actually scans, and decide what to pin under a byte budget.
  * This class is that policy surface, closing the one SURVEY §2.1 row
  * that stayed "partial" through r9.
  *
  * Usage: call [[record]] with each workload plan (cheap: walks the
  * optimized plan's leaves, no execution); ask [[advise]] for the
  * persist set under a budget (greedy by re-read bytes saved — a
  * relation read H times from cold storage wastes (H−1)·bytes, so value
  * density is H−1 and the greedy knapsack ranks by hits, packing while
  * the budget holds); ask [[evictions]] for the LRU drop list when the
  * resident set overruns the budget (the reference's eviction order,
  * cache-mgr.cc LRU list). Deliberately advisory: callers apply the
  * advice with [[Caching.cached]]/[[Caching.release]] so plans stay
  * unchanged unless a deployment opts in.
  */
final class CacheAdvisor {
  import scala.collection.mutable

  /** One tracked source relation (keyed by its root paths). */
  final case class Usage(paths: String, bytes: Long, hits: Long, lastSeen: Long)

  private val ledger = mutable.LinkedHashMap[String, Usage]()
  private var clock = 0L

  /** Observe a plan: every file-backed leaf counts one hit at the current
    * logical time, with real FileIndex bytes (facts, not estimates). */
  def record(df: DataFrame): Unit = synchronized {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.optimizedPlan.collectLeaves().foreach {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val key = fs.location.rootPaths.map(_.toString).sorted.mkString(",")
          clock += 1
          val prev = ledger.get(key)
          ledger.put(key, Usage(key, fs.location.sizeInBytes,
            prev.map(_.hits).getOrElse(0L) + 1, clock))
        case _ => ()
      }
      case _ => ()
    }
  }

  /** Current ledger, most-recently-seen first. */
  def usages: Seq[Usage] = synchronized {
    ledger.values.toSeq.sortBy(-_.lastSeen)
  }

  /** Persist set under `budgetBytes`: greedy knapsack by re-read savings
    * (hits − 1 is the value density; single-hit relations save nothing
    * and are never advised). Deterministic: ties break on bytes desc,
    * then path. */
  def advise(budgetBytes: Long): Seq[Usage] = synchronized {
    var left = budgetBytes
    ledger.values.toSeq
      .filter(_.hits > 1)
      .sortBy(u => (-u.hits, -u.bytes, u.paths))
      .flatMap { u =>
        if (u.bytes <= left) { left -= u.bytes; Some(u) } else None
      }
  }

  /** LRU eviction order for a resident set that exceeds `budgetBytes`:
    * drop least-recently-seen first until the remainder fits — the
    * reference's cache-mgr eviction walk. Paths the ledger never recorded
    * have UNKNOWN size, so their contribution to the resident total is
    * unverifiable: counting them as 0 would let a 10 GB unknown resident
    * "fit" any budget and the walk would evict nothing. They are evicted
    * unconditionally (an unseen path is infinitely cold — there is no
    * recorded evidence it is worth keeping) and the LRU walk then runs on
    * the known remainder, whose sizes are facts. */
  def evictions(resident: Seq[String], budgetBytes: Long): Seq[String] = synchronized {
    val (unknown, known) = resident.partition(p => ledger.get(p).isEmpty)
    var total = known.map(ledger(_).bytes).sum
    val out = mutable.ArrayBuffer[String](unknown: _*)
    val it = known.sortBy(ledger(_).lastSeen).iterator
    while (total > budgetBytes && it.hasNext) {
      val p = it.next()
      out += p
      total -= ledger(p).bytes
    }
    out.toSeq
  }
}
