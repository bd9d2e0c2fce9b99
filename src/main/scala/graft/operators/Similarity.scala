package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  * Extension surface beyond the reference (its only vector trace is the
  * madlib string-encoded vectors, be/src/exprs/udf-builtins.h:558) — built
  * on ArrayType the way SURVEY §2.9 prescribes.
  *
  * All arithmetic is double, accumulated with a sequential left fold
  * (`aggregate`), so results are bit-deterministic for a given element
  * order — which makes top-k reproducible and oracle-checkable.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * pipelines over the corpus — one pass, no shuffle except the final
  * per-query top-k (TakeOrdered-style). The LSH variant buckets both sides
  * by hash-derived hyperplane signs and joins bucket-to-bucket: candidate
  * generation is an equi-join, never a cross join — the 100 TB path.
  */
object Similarity {

  /** dot(a, b) in double with sequential accumulation — a codegen'd
    * Catalyst expression (VectorMath.dot), bit-identical to the
    * `aggregate(zip_with(...))` fold it replaces but ~an order of
    * magnitude faster: one tight loop inside whole-stage codegen vs
    * per-element interpreted lambda dispatch. */
  def dot(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass cosine (dot + both norms in one loop). */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Brute-force cosine top-k: every query row against every corpus row,
    * queries broadcast. Returns (query id, corpus id, cosine, rank). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rnk"))
  }

  /** Deterministic ±1 hyperplane weights: nothing random at runtime, the
    * planes are a pure function of (plane index, dimension). */
  private def planeWeights(planes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until planes).map { p =>
      (0 until dims).map { d =>
        val h = graft.functions.FnvHash64.hashLongBits((p.toLong << 32) | d.toLong, 8)
        if ((h & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Sign-LSH bucket id: bit b set iff dot(v, plane_b) >= 0. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column = {
    val ws = planeWeights(planes, dims)
    val signBits = (0 until planes).map { p =>
      val w = array(ws(p).map(lit): _*)
      when(dot(vec, w) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    signBits.reduce(_ + _)
  }

  /** LSH-bucketed cosine top-k: candidates only from the query's bucket.
    * Recall < 1 by construction (documented); bucket count tunes the
    * candidate-set size: ~|corpus| / 2^planes candidates per query. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 6, dims: Int = 64): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    c.join(broadcast(q), Seq("bucket"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rnk"))
  }

  /** IVF-style cosine top-k: corpus bucketed by nearest k-means centroid,
    * queries probe their `nProbe` closest centroids, exact cosine re-ranks
    * within probed buckets (the classic IVF-flat recall/cost trade).
    *
    * Scale: centroids are tiny and broadcast; the corpus is scanned once to
    * assign buckets (one ML pass), and candidate generation is the
    * (bucket) equi-join — identical shuffle shape to the LSH variant, with
    * data-adaptive buckets instead of oblivious hyperplanes. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nProbe: Int = 2): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession

    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cv"))
      .withColumn("features", array_to_vector(col("cv").cast("array<double>")))
    val model = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(10).fit(c)
    val assigned = model.transform(c)
      .select(col("cand_id"), col("cv"), col("prediction").as("bucket"))

    // centroid table (tiny, broadcast): queries rank centroids by L2 and
    // keep the nProbe nearest buckets
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }.toSeq.toDF("bucket", "centroid")
    val l2 = aggregate(
      zip_with(col("qv"), col("centroid"), (x, y) => {
        val d = x.cast("double") - y
        d * d
      }), lit(0.0), (acc, x) => acc + x)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(l2.asc, col("bucket").asc)))
      .filter(col("rnk") <= nProbe)
      .select(col("query_id"), col("qv"), col("bucket"))

    assigned.join(broadcast(probes), Seq("bucket"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("cand_id"), col("sim"), col("rnk"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (id_a < id_b,
    * cosine above threshold). Candidate generation is the bucket equi-join. */
  def cosineNearDupPairs(
      vecs: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 6, dims: Int = 64): DataFrame = {
    val t = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val a = t.select(col("bucket"), col("id").as("id_a"), col("v").as("va"))
    val b = t.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosine(col("va"), col("vb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }
}
