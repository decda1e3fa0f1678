package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables

/** Text operators: the reference engine's entire production query surface
  * (word count / top-k / distinct words — coordinator.py:62-136, worker.py:9-17)
  * plus the mandated text-analysis extensions (n-grams, document frequency,
  * language ID, quality scoring, token stats, fingerprinting).
  *
  * Scale notes (100 TB): every pipeline here is scan → narrow per-row transform
  * (tokenize = codegen'd regex, no UDF) → explode → hash partial agg → shuffle
  * on the group key → final agg. The partial aggregate (Spark's built-in
  * map-side combine, HashAggregateExec mode=Partial) is the same optimization
  * the reference hand-rolls in worker.py:13-15; shuffle volume is bounded by
  * distinct keys per task, not input size. Top-k is TakeOrderedAndProject —
  * a per-partition heap + driver merge of k rows, never a global sort spill.
  */
object TextAnalytics {

  /** Words per doc, lowered + tokenized with the reference regex. */
  def docTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))

  /** word → count over the whole corpus (reference O5+O6). */
  def wordCounts(docs: DataFrame): DataFrame =
    wordCountsText(docs, "text")

  /** word → count over any text column (documents table or raw text lines —
    * the Report/textLines ingest path shares this exact pipeline). */
  def wordCountsText(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Flagship: reference parity top-k (O3,O4,O5,O6,O9,O10) with the rebuild's
    * deterministic total order (count desc, word asc — SURVEY §2 R1). */
  def wordcountTopK(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    wordCounts(Tables.documents(spark, dir))
      .orderBy(desc("cnt"), asc("word"))
      .limit(k)

  /** Full frequency table, the TSV-sink analog (O12). */
  def wordcountFull(spark: SparkSession, dir: String): DataFrame =
    wordCounts(Tables.documents(spark, dir))
      .orderBy(desc("cnt"), asc("word"))

  /** Distinct-word count per language (O11 generalized). */
  def distinctWords(spark: SparkSession, dir: String): DataFrame =
    docTokens(Tables.documents(spark, dir))
      .select(col("lang"), explode(col("toks")).as("word"))
      .groupBy("lang")
      .agg(countDistinct("word").as("n_words"))
      .orderBy("lang")

  /** Sketch variant of distinctWords: HyperLogLog++ via
    * approx_count_distinct. At 100 TB the exact distinct (a second shuffle
    * of every (lang, word) pair) is the expensive path; the sketch merges
    * fixed-size registers instead. rows-only in the gate (sketch estimates
    * are engine-specific); TextAnalyticsSpec gates the error vs exact. */
  def distinctWordsApprox(spark: SparkSession, dir: String): DataFrame =
    docTokens(Tables.documents(spark, dir))
      .select(col("lang"), explode(col("toks")).as("word"))
      .groupBy("lang")
      .agg(approx_count_distinct("word").as("n_words_approx"))
      .orderBy("lang")

  /** Bigram frequency top-k. */
  def ngramTopK(spark: SparkSession, dir: String, n: Int = 2, k: Int = 20): DataFrame =
    docTokens(Tables.documents(spark, dir))
      .select(explode(wordNgrams(col("toks"), n)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("bigram"))
      .limit(k)

  /** Document frequency per term (integer counts only; TF-IDF's float log is
    * deliberately kept out of the oracle surface — SURVEY §2.D). */
  def docFrequency(spark: SparkSession, dir: String): DataFrame =
    docTokens(Tables.documents(spark, dir))
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .distinct()
      .groupBy("word")
      .agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("word"))

  /** TF-IDF per (doc, term): tf · ln(N/df), 1e-4 fixed point. Kept OUT of
    * the DuckDB oracle set deliberately — ln is a libm call whose last ulp
    * is not pinned across engines, and rule R2 forbids float outputs in
    * hash-matched queries. TextAnalyticsSpec pins the formula against
    * in-JVM expected values on a planted corpus instead. Shape: the doc-term
    * counts and the df table come from the same exploded scan; the join on
    * term is the only shuffle beyond the aggregations. */
  def tfIdf(spark: SparkSession, dir: String): DataFrame =
    tfIdfDf(Tables.documents(spark, dir))

  def tfIdfDf(docs: DataFrame): DataFrame = {
    val (tfdf, n) = termFrequencies(docs)
    tfdf.select(
        col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf") * log(lit(n.toDouble) / col("df")) * lit(10000)).cast("long").as("tfidf_e4"))
      .orderBy("doc_id", "word")
  }

  /** Shared tf/df kit for the two weighting variants: per-(doc, word) term
    * frequency joined with per-word document frequency, plus the corpus
    * size. `terms` feeds both aggregations — persisted so the
    * scan→tokenize→explode runs once (harness clears cache per query). */
  private def termFrequencies(docs: DataFrame): (DataFrame, Long) = {
    val terms = docTokensText(docs)
      .select(col("doc_id"), explode(col("toks")).as("word"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tf = terms.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df_ = terms.distinct().groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.count() // one scalar; the scan is cheap relative to the explode
    (tf.join(df_, "word"), n)
  }

  /** Log-free TF-IDF sibling: weight = tf · N / df in 1e-4 fixed point —
    * the rational inverse-frequency weighting (no `ln`), which preserves the
    * same per-document ranking of terms by rarity while staying exactly
    * oracle-expressible (rule R2 keeps libm out of hash-matched outputs;
    * this is the hash-matched twin of the rows-only `text_tfidf`). One
    * double multiply-divide in fixed op order, then round. */
  def tfIdfLinear(spark: SparkSession, dir: String): DataFrame = {
    val (tfdf, n) = termFrequencies(Tables.documents(spark, dir))
    tfdf.select(
        col("doc_id"), col("word"), col("tf"), col("df"),
        round(col("tf") * lit(10000.0) * lit(n.toDouble) / col("df")).cast("long").as("w_e4"))
      .orderBy("doc_id", "word")
  }

  /** docTokens without the lang column (works on any (doc_id, text) frame). */
  def docTokensText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))

  // Marker stopword sets for the n-gram-free language-ID heuristic. Tiny on
  // purpose: at 100 TB the marker lookup is a codegen'd IN-list per token,
  // no join, no broadcast needed.
  val EnMarkers = Seq("the", "a", "and", "of", "is")
  val DeMarkers = Seq("der", "die", "das", "und", "ist")
  val EsMarkers = Seq("el", "la", "los", "que", "y")
  val FrMarkers = Seq("le", "les", "des", "et", "est")
  val StopWords = Seq("the", "a", "and", "of", "is", "to", "in")

  private[operators] def hits(toks: org.apache.spark.sql.Column, markers: Seq[String]) =
    size(filter(toks, t => t.isin(markers: _*))).cast("long")

  /** The language-ID argmax (priority en > de > es > fr, 'und' on zero hits)
    * as a column over the four score columns — shared by langId and the
    * corpus_clean gate so the heuristic can't drift between them. */
  private[operators] def langPred(en: org.apache.spark.sql.Column,
      de: org.apache.spark.sql.Column, es: org.apache.spark.sql.Column,
      fr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(en >= de && en >= es && en >= fr && en > 0, lit("en"))
      .when(de >= es && de >= fr && de > 0, lit("de"))
      .when(es >= fr && es > 0, lit("es"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("und"))

  /** Language-ID heuristic: count marker-word hits per language, argmax with
    * fixed priority en > de > es > fr, 'und' when no marker hits at all. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = docTokens(Tables.documents(spark, dir))
      .select(
        col("doc_id"), col("lang"),
        hits(col("toks"), EnMarkers).as("en_s"),
        hits(col("toks"), DeMarkers).as("de_s"),
        hits(col("toks"), EsMarkers).as("es_s"),
        hits(col("toks"), FrMarkers).as("fr_s"))
    t.withColumn(
        "pred",
        langPred(col("en_s"), col("de_s"), col("es_s"), col("fr_s")))
      .orderBy("doc_id")
  }

  /** Quality scoring: token count, mean token length, stopword ratio (both as
    * 1e-4 fixed-point), and a boolean-ish quality flag. All-integer outputs. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val t = docs.select(
      col("doc_id"),
      // text is [a-z ]-only, so total token chars = length with spaces removed;
      // identical formula on the DuckDB side avoids any HOF-sum ordering question.
      length(replace(col("text"), lit(" "), lit(""))).as("alpha_len"),
      tokens(col("text")).as("toks"))
    t.select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        col("alpha_len"),
        hits(col("toks"), StopWords).as("stop_hits"))
      .select(
        col("doc_id"),
        col("n_toks"),
        round(col("alpha_len") * lit(10000.0) / col("n_toks")).cast("long").as("avg_len_e4"),
        round(col("stop_hits") * lit(10000.0) / col("n_toks")).cast("long").as("stop_e4"),
        when(col("n_toks") >= 5 && col("stop_hits") > 0, lit(1L)).otherwise(lit(0L)).as("ok"))
      .orderBy("doc_id")
  }

  /** Token counting: whitespace split vs reference-regex tokens vs a BPE-ish
    * piece regex (letter runs or single non-letter glyphs). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
        col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("ws_tokens"),
        size(tokens(col("text"))).cast("long").as("re_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[^a-z ]"), lit(0))).cast("long").as("piece_tokens"),
        length(col("text")).cast("long").as("text_len"))
      .orderBy("doc_id")

  /** Document fingerprint: 32-bit polynomial rolling hash of the full text
    * (deterministic, engine-portable — see Fns.polyHash). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), polyHash(col("text")).as("fp"))
      .orderBy("doc_id")
}
