package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expressions for training-data pipelines: token counting,
  * quality scoring, language-ID heuristics, document fingerprints.
  * (Extension surface beyond the reference; composed entirely from
  * codegen'd builtins — no UDFs — so they run inside whole-stage codegen
  * over a 100 TB scan.)
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword proxy: word pieces + standalone punctuation (the
    * usual `\w+|[^\w\s]` pre-tokenizer shape). */
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit("\\w+|[^\\w\\s]"))

  def avgTokenLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") / tokenCount(text)

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?'\"()-]", "")).cast("double") /
      greatest(length(text), lit(1))

  def digitRatio(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", "")).cast("double") / greatest(length(text), lit(1))

  def upperRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Z]", "")).cast("double") / greatest(length(text), lit(1))

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Fraction of tokens that are (English) stopwords — a fluency signal. */
  def stopwordRatio(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isin(enStop: _*))).cast("double") /
      greatest(tokenCount(text), lit(1))

  /** Composite quality score in [0,1]: length-normalized, penalizes
    * punctuation/digit noise, rewards stopword fluency. The exact weights
    * are a policy choice; determinism is the requirement. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
    val fluency = least(stopwordRatio(text) * 5.0, lit(1.0))
    val noise = punctRatio(text) + digitRatio(text)
    greatest(lit(0.0), least(lit(1.0),
      lenScore * 0.4 + fluency * 0.4 + (lit(0.2) - least(noise, lit(0.2)))))
  }

  /** N-gram-frequency language-ID heuristic: scores per-language marker
    * sets and takes the argmax, 'und' when nothing matches. Pure CASE/regexp
    * composition so it pushes into codegen (and mirrors into plain SQL). */
  def langGuess(text: Column): Column = {
    val t = lower(text)
    // one regex pass per language: |distinct markers matched| equals the
    // sum of per-marker indicators (each contributes 0/1), so results are
    // bit-identical to the per-word rlike form while scanning the text 5×
    // less (word boundaries disambiguate prefix overlaps like a/and)
    def hits(words: Seq[String]): Column =
      size(array_distinct(regexp_extract_all(
        t, lit("\\b(" + words.mkString("|") + ")\\b"), lit(1))))
    val en = hits(Seq("the", "and", "of", "is", "a"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "la", "et", "est", "les"))
    val es = hits(Seq("el", "los", "es", "y", "que"))
    val zh = when(t.rlike("[\\u4e00-\\u9fff]"), 5).otherwise(0)
    when(greatest(en, de, fr, es, zh) === 0, "und")
      .when(zh >= greatest(en, de, fr, es), "zh")
      .when(de > greatest(en, fr, es), "de")
      .when(fr > greatest(en, es), "fr")
      .when(es > en, "es")
      .otherwise("en")
  }

  /** 64-bit document fingerprint: FNV over the normalized token stream
    * (whitespace-collapsed lowercase) — a rolling-hash-style content id
    * that ignores formatting noise. */
  def fingerprint64(text: Column): Column =
    call_function("fnv_hash", regexp_replace(lower(trim(text)), "\\s+", " "))

  /** SimHash-64: per-bit majority vote of token-hash bits, weighted by
    * token frequency — near-identical texts land within a few bits.
    * Token hashes are materialized ONCE (`transform` → array<long>), then
    * the 64 bit-votes fold over the precomputed longs; hashing per bit
    * would cost 64× the string hashing for the same result. */
  def simhash64(text: Column): Column = {
    val tokHashes = transform(tokens(lower(text)), t => xxhash64(t))
    val bits = (0 until 64).map { b =>
      val vote = aggregate(tokHashes, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Bulk simhash as a relational plan: token explode → codegen'd hash-agg
    * of 64 bit-votes → bit-pack. Same result as [[simhash64]] but the
    * per-token loop runs inside whole-stage codegen with map-side partial
    * aggregation (the Column form's higher-order functions evaluate
    * interpreted — fine for a few rows, wrong for a corpus scan). */
  def simhashTable(docs: org.apache.spark.sql.DataFrame, textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val hashed = docs
      .select(col(idCol).as("doc_id"), explode(toks).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$b"))
    hashed.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }
}
