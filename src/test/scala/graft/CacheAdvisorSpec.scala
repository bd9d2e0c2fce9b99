package graft

import org.apache.spark.sql.functions._

/** CacheAdvisor — the dfs_cache policy surface (SURVEY §2.1's last
  * "partial" row, promoted): ledger accounting from real plans, greedy
  * persist advice under a budget, LRU eviction order, and the advice
  * actually paying off end-to-end (InMemoryTableScan on the repeat run).
  */
class CacheAdvisorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ledger counts hits per source relation with real file bytes") {
    val adv = new CacheAdvisor
    // a repeated-scan workload: lineitem 3x, orders 2x, region 1x
    adv.record(Tables.load(spark, sf, "lineitem").filter(col("l_quantity") > 10))
    adv.record(Tables.load(spark, sf, "lineitem").groupBy(col("l_returnflag")).count())
    adv.record(Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")))
    adv.record(Tables.load(spark, sf, "orders").select(col("o_orderkey")))
    adv.record(Tables.load(spark, sf, "region"))
    val byPath = adv.usages.map(u => u.paths.split('/').last -> u).toMap
    assert(byPath("lineitem.parquet").hits === 3)
    assert(byPath("orders.parquet").hits === 2)
    assert(byPath("region.parquet").hits === 1)
    val realBytes = new java.io.File(s"$sf/lineitem.parquet").length()
    assert(byPath("lineitem.parquet").bytes === realBytes)
  }

  test("advice is a greedy knapsack by re-read savings; single-hit relations never advised") {
    val adv = new CacheAdvisor
    adv.record(Tables.load(spark, sf, "lineitem"))
    adv.record(Tables.load(spark, sf, "lineitem"))
    adv.record(Tables.load(spark, sf, "lineitem"))
    adv.record(Tables.load(spark, sf, "orders"))
    adv.record(Tables.load(spark, sf, "orders"))
    adv.record(Tables.load(spark, sf, "region"))
    val Seq(liBytes, oBytes) = Seq("lineitem", "orders")
      .map(t => new java.io.File(s"$sf/$t.parquet").length())
    // unlimited budget: hottest first, cold single-hit region absent
    val all = adv.advise(Long.MaxValue)
    assert(all.map(_.paths.split('/').last) ===
      Seq("lineitem.parquet", "orders.parquet"))
    // budget below the hottest relation: greedy skips it but still packs
    // the next one that fits (classic knapsack fill, not prefix-cut)
    assert(oBytes < liBytes, "setup: orders must be the smaller file")
    val tight = adv.advise(liBytes - 1)
    assert(tight.map(_.paths.split('/').last) === Seq("orders.parquet"))
    // zero budget: nothing fits
    assert(adv.advise(0).isEmpty)
  }

  test("eviction walks least-recently-seen first until the budget holds") {
    val adv = new CacheAdvisor
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders")
    adv.record(li); adv.record(o) // orders seen later -> lineitem is LRU
    val Seq(liPath, oPath) = adv.usages.sortBy(_.paths).map(_.paths)
      .sorted.toSeq // deterministic order for the call below
    val both = Seq(liPath, oPath)
    val totalBytes = adv.usages.map(_.bytes).sum
    // budget holds everything: no eviction
    assert(adv.evictions(both, totalBytes).isEmpty)
    // budget holds only the hotter/newer half: LRU (lineitem) goes first
    val liBytes = adv.usages.find(_.paths == liPath).get.bytes
    val evicted = adv.evictions(both, totalBytes - liBytes)
    assert(evicted.headOption.contains(liPath))
    // unknown resident path is coldest of all
    assert(adv.evictions("unknown" +: both, 0).head === "unknown")
    // ... and evicts even under a generous budget: its size is UNKNOWN,
    // so the budget cannot be certified while it stays resident (counting
    // it as 0 bytes would let a huge unrecorded resident "fit" anything)
    assert(adv.evictions("unknown" +: both, totalBytes) === Seq("unknown"))
  }

  test("applying the advice pays off: the repeat run hits InMemoryTableScan") {
    val adv = new CacheAdvisor
    def q() = Tables.load(spark, sf, "nation").groupBy(col("n_regionkey")).count()
    adv.record(q()); adv.record(q())
    val advised = adv.advise(Long.MaxValue)
    assert(advised.nonEmpty)
    val pinned = Tables.load(spark, sf, "nation")
    Caching.cached(pinned)
    try {
      pinned.count() // materialize
      val repeat = q()
      assert(repeat.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
        "cache substitution should serve the repeat scan from the pinned relation")
      assert(repeat.collect().length === 5)
    } finally Caching.release(pinned)
  }
}
