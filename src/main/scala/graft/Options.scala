package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `SET` query-option mapping (reference: be/src/service/query-options.cc,
  * 62 options). Only the options that change semantics or plan shape map
  * to live Spark confs; pure-resource options (MEM_LIMIT and friends) are
  * accepted and recorded but intentionally inert — executor sizing is a
  * cluster-manager concern on Spark, not a per-query knob.
  */
object Options {

  /** Impala option name (upper) → Spark conf + value translation. */
  private val mapped: Map[String, String => (String, String)] = Map(
    // COUNT(DISTINCT) → ndv sketch rewrite (the one custom optimizer rule).
    // The reference accepts 0/1 booleans; canonicalize so every read site
    // (EngineSession.sql, the optimizer rule's getConfString) sees
    // "true"/"false" and never throws on `SET APPX_COUNT_DISTINCT=1`.
    "APPX_COUNT_DISTINCT" -> (v => (plans.AppxCountDistinctRewrite.ConfKey,
      if (v.equalsIgnoreCase("true") || v.trim == "1") "true" else "false")),
    // LLVM codegen toggle → whole-stage codegen toggle
    "DISABLE_CODEGEN" -> (v => ("spark.sql.codegen.wholeStage", flip(v))),
    // row-batch size → columnar reader batch size
    "BATCH_SIZE" -> (v => ("spark.sql.parquet.columnarReaderBatchSize", v)),
    // scan error tolerance → reader parse mode
    "ABORT_ON_ERROR" -> (v =>
      ("spark.sql.graft.readerMode", if (v.equalsIgnoreCase("true") || v == "1") "FAILFAST" else "PERMISSIVE")),
    // INSERT compression codec
    "COMPRESSION_CODEC" -> (v => ("spark.sql.parquet.compression.codec", v.toLowerCase))
    // NUM_NODES (single-node shortcut → shuffle parallelism) is handled
    // directly in set(): 0 means "use all nodes" and must restore the
    // session default, not set shuffle.partitions=0 (SQLConf rejects it).
  )

  private def flip(v: String): String =
    if (v.equalsIgnoreCase("true") || v == "1") "false" else "true"

  /** Spark conf value → Impala option value, per option (the inverse of
    * `mapped`'s translation, so `SET` output echoes what the user set:
    * after SET DISABLE_CODEGEN=true the codegen conf reads "false" but the
    * option must print "true"; reader mode FAILFAST prints as
    * ABORT_ON_ERROR=true). Identity where the translation is 1:1. */
  private val unmapped: Map[String, String => String] = Map(
    "DISABLE_CODEGEN" -> flip,
    "ABORT_ON_ERROR" -> (v => if (v == "FAILFAST") "true" else "false")
  )

  /** Apply `SET name=value`. Unknown/resource-only options are recorded
    * under a namespaced conf (visible, inert) like the reference records
    * them in its per-query options struct. */
  // Session default stash for NUM_NODES=0 restore (conf.unset would fall
  // back to Spark's static 200, not the session's configured parallelism).
  private val NumNodesStash = "spark.graft.option.num_nodes.default"

  // Pre-SET value stash for every mapped conf: UNSET must restore the
  // SESSION's built default, not Spark's global one. With
  // SPARK_GRAFT_EXTRA_CONF="spark.sql.codegen.wholeStage=false" (the
  // config-axis sweep), plain conf.unset on UNSET DISABLE_CODEGEN would
  // silently turn codegen back ON — the same hazard NumNodesStash guards.
  // Distinct prefix from spark.graft.option.* so show() never surfaces it.
  private val StashPrefix = "spark.graft.stash."
  private val UnsetMarker = "<graft:unset>"

  def set(spark: SparkSession, name: String, value: String): Unit =
    if (name.equalsIgnoreCase("NUM_NODES")) {
      // record the option value as typed so SET output can echo it
      spark.conf.set("spark.graft.option.num_nodes", value)
      if (value == "0") {
        // 0 = "use all nodes" (the reference default): restore the
        // parallelism the session had before the first NUM_NODES override.
        spark.conf.getOption(NumNodesStash)
          .foreach(v => spark.conf.set("spark.sql.shuffle.partitions", v))
      } else {
        if (spark.conf.getOption(NumNodesStash).isEmpty)
          spark.conf.set(NumNodesStash, spark.conf.get("spark.sql.shuffle.partitions"))
        spark.conf.set("spark.sql.shuffle.partitions", value)
      }
    } else mapped.get(name.toUpperCase) match {
      case Some(f) =>
        val (k, v) = f(value)
        // First SET of this conf in the session: stash the pre-SET value
        // so UNSET can restore the session's own default.
        if (spark.conf.getOption(StashPrefix + k).isEmpty)
          spark.conf.set(StashPrefix + k,
            spark.conf.getOption(k).getOrElse(UnsetMarker))
        // Adopted sessions lack the early-batch optimizer rule, so the ndv
        // rewrite reaches DataFrame-API queries with 2+ DISTINCT aggregates
        // only on built sessions (EngineSession.sql closes the fork for the
        // SQL surface). Make the semantic split loud at SET time.
        if (name.equalsIgnoreCase("APPX_COUNT_DISTINCT") &&
            v.equalsIgnoreCase("true") && EngineSession.isAdopted(spark))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "APPX_COUNT_DISTINCT=true on an ADOPTED session: SQL run through " +
            "EngineSession.sql gets the ndv rewrite, but DataFrame-API queries " +
            "with 2+ DISTINCT aggregates keep exact semantics (the optimizer " +
            "fallback runs after RewriteDistinctAggregates).")
        spark.conf.set(k, v)
      case None =>
        spark.conf.set(s"spark.graft.option.${name.toLowerCase}", value)
    }

  /** `UNSET name` (impala_shell do_unset): return an option to its
    * default. Mapped options unset their translated Spark conf, falling
    * back to the session's built default — the same value the option had
    * before the first SET, which is how the reference's per-query options
    * struct behaves. NUM_NODES restores the stashed session parallelism;
    * recorded-only options simply drop their namespaced conf. */
  def unset(spark: SparkSession, name: String): Unit =
    if (name.equalsIgnoreCase("NUM_NODES")) {
      spark.conf.getOption(NumNodesStash)
        .foreach(v => spark.conf.set("spark.sql.shuffle.partitions", v))
      spark.conf.unset("spark.graft.option.num_nodes")
      spark.conf.unset(NumNodesStash)
    } else mapped.get(name.toUpperCase) match {
      case Some(f) =>
        val k = f("true")._1
        spark.conf.getOption(StashPrefix + k) match {
          case Some(UnsetMarker) => spark.conf.unset(k)
          case Some(prev)        => spark.conf.set(k, prev)
          case None =>
            // Never SET through this surface: restore the engine's own
            // default for the conf if it defines one (static or
            // deployment-supplied), else drop it.
            (EngineSession.staticConfs ++ EngineSession.extraConfs).get(k)
              .fold(spark.conf.unset(k))(spark.conf.set(k, _))
        }
        spark.conf.unset(StashPrefix + k)
      case None => spark.conf.unset(s"spark.graft.option.${name.toLowerCase}")
    }

  /** `SET` with no args: the option surface only — recorded Impala
    * options (`spark.graft.option.*`, surfaced under their Impala names)
    * plus the live Spark confs the mapped options translate to. The
    * reference prints its ~62 options here, not the engine's whole conf
    * namespace; dumping every `spark.sql.*` would swamp a user the same
    * way. */
  def show(spark: SparkSession): Map[String, String] = {
    val all = spark.conf.getAll
    val recorded = all.collect {
      case (k, v) if k.startsWith("spark.graft.option.") && k != NumNodesStash =>
        k.stripPrefix("spark.graft.option.").toUpperCase -> v
    }
    val live = mapped.map { case (name, f) =>
      val (conf, _) = f("true")
      val raw = all.getOrElse(conf, "")
      name -> (if (raw.isEmpty) raw else unmapped.getOrElse(name, identity[String] _)(raw))
    }.filter(_._2.nonEmpty)
    // NUM_NODES rides the recorded namespace (set() records it as typed),
    // so it surfaces like any other option once set — no value inference.
    recorded ++ live
  }

  /** EXPLAIN honoring the session's `SET EXPLAIN_LEVEL` (0..3, default 0
    * like the reference's minimal level). */
  def explain(spark: SparkSession, df: DataFrame): String =
    explain(df, spark.conf.getOption("spark.graft.option.explain_level")
      .flatMap(_.toIntOption).getOrElse(0))

  /** EXPLAIN levels (reference: 4 levels, explain-level*.test) →
    * Spark explain modes. */
  def explain(df: DataFrame, level: Int): String = {
    val mode = level match {
      case 0 => "simple"
      case 1 => "extended"
      case 2 => "cost"
      case _ => "formatted"
    }
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode))
  }

  /** Post-execution per-operator summary (impala_shell do_summary: the
    * exec summary table of operator / #rows / peak mem). The Spark
    * analogue reads each physical operator's SQLMetrics off the FINAL
    * adaptive plan — metrics are zero until the frame has actually run, so
    * call after an action. One line per operator, indented by tree depth:
    * `operator  #rows  <other populated metrics>`. */
  def summary(df: DataFrame): String = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps stages; unwrap to the operators that actually executed
    // (queryExecution.sparkPlan would show the PRE-adaptive tree).
    def children(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case other                    => other.children
    }
    val out = new StringBuilder
    def walk(p: SparkPlan, depth: Int): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
      case s: QueryStageExec        => walk(s.plan, depth)
      case op =>
        val rows = op.metrics.get("numOutputRows").map(_.value)
        val rest = op.metrics.view
          .filterKeys(_ != "numOutputRows").toSeq
          .filter(_._2.value > 0)
          .sortBy(_._1)
          .map { case (k, m) => s"$k=${m.value}" }
        out.append("  " * depth).append(op.nodeName)
          .append(rows.fold("")(r => s"  #rows=$r"))
          .append(if (rest.isEmpty) "" else rest.mkString("  [", ", ", "]"))
          .append('\n')
        children(op).foreach(walk(_, depth + 1))
    }
    walk(df.queryExecution.executedPlan, 0)
    out.result()
  }

  /** `profile` (impala_shell do_profile): the full runtime profile of an
    * executed frame — the formatted plan (operator ids, codegen spans,
    * pushed filters) followed by the per-operator exec-metric tree from
    * [[summary]]. Like the reference, the profile is meaningful after the
    * query has run: metrics are live SQLMetrics and read zero before an
    * action. */
  def profile(df: DataFrame): String =
    explain(df, 3) + "\nExec Summary:\n" + summary(df)

  /** `version` (impala_shell do_version): the engine identifier — this
    * library's dialect version over the Spark runtime actually loaded.
    * Falls back to "dev" when run from unpackaged classes (sbt test). */
  def version(spark: SparkSession): String = {
    val v = Option(getClass.getPackage.getImplementationVersion).getOrElse("dev")
    s"graft/$v spark/${spark.version}"
  }
}
