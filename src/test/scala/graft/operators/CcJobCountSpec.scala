package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.SparkSpec

/** Pins the scheduler cost of a connectedComponents round (VERDICT r7
  * item 5): the convergence check must ride the label-update job, not run
  * as its own count() action. On a 100 TB run every extra driver action
  * per round is a full scheduler round-trip on top of a real shuffle. */
class CcJobCountSpec extends SparkSpec {

  /** Distinct SQL execution ids started while `body` runs — one per
    * driver ACTION. Raw job counts are the wrong unit here: AQE splits a
    * single action into one job per materialized shuffle stage, which is
    * scheduler pipelining, not a driver round-trip. */
  private def countActions(body: => Unit): Int = {
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        Option(jobStart.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .foreach(ids.add)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // the listener bus is async (and private); poll until the job
      // counter stabilizes instead of draining it
      var last = -1
      var spins = 0
      while (jobs.get() != last && spins < 40) {
        last = jobs.get(); spins += 1; Thread.sleep(50)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    ids.size()
  }

  test("hooking rounds and compression passes each ride one driver action") {
    import spark.implicits._
    // diameter-11 monotone chain: ONE hooking round merges everything
    // (every root hooks to its smaller neighbor), compression flattens
    // the depth-11 hook chain by doubling, and the second hooking round
    // observes the fixpoint
    val chain = (1L to 12L).toDF("id")
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val actions = countActions {
      Dedup.connectedComponents(chain, pairs)
    }
    // Budget: 2 eager-checkpoint actions for edges+labels init, 2 hooking
    // rounds (merge-all + no-op fixpoint), and ≤5 compression passes
    // (depth 11 → 4 doubling passes + the flat-confirming pass). Every
    // action carries its convergence/flatness tick on the SAME job — a
    // separate count() per round would blow this bound immediately (the
    // pre-r7 shape measured ~3 actions/round).
    assert(actions <= 2 + 2 + 5,
      s"connectedComponents ran $actions driver actions for a " +
        "2-round + 5-compression fixture — did a convergence check stop " +
        "riding the update job?")
  }
}
