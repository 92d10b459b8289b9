package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation over the
  * documents table. Pure column expressions (whole-stage codegen);
  * every operator is a narrow projection — zero shuffles — so
  * throughput is scan-bound at any scale.
  */
object TextAnalysis {

  // ------------------------------------------------------------ tokenizing

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols — a cheap deterministic proxy for tokenizer
    * load (regexp_count is a Spark 3.5+/4.x built-in). */
  def tokenCountBpe(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  // ---------------------------------------------------------- quality score

  /** Quality heuasures: length, punctuation ratio, stopword ratio,
    * mean word length, and a composite [0,1] score — the standard
    * C4/Gopher-style cheap filters. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val words = filter(split(lower(text), "\\W+"), t => length(t) > 0)
    val nWords = size(words)
    val punct = regexp_count(text, lit("[\\p{Punct}]"))
    val stop = size(array_intersect(array_distinct(words), Stopwords.en))
    val meanWordLen = when(nWords > 0,
      aggregate(words, lit(0), (a, w) => a + length(w)).cast("double") / nWords)
      .otherwise(lit(0.0))
    val punctRatio = when(nChars > 0, punct.cast("double") / nChars).otherwise(1.0)
    val stopRatio = when(size(array_distinct(words)) > 0,
      stop.cast("double") / size(array_distinct(words))).otherwise(0.0)
    val lengthOk = (nWords >= 5 && nChars >= 20).cast("double")
    val score = lengthOk * (lit(1.0) - least(punctRatio * 4, lit(1.0))) *
      least(stopRatio * 5 + 0.2, lit(1.0)) *
      when(meanWordLen.between(2.5, 12.0), 1.0).otherwise(0.3)
    Seq(
      "n_chars_calc" -> nChars.cast("long"),
      "n_words" -> nWords.cast("long"),
      "punct_ratio" -> punctRatio,
      "stopword_ratio" -> stopRatio,
      "mean_word_len" -> meanWordLen,
      "quality_score" -> score)
  }

  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame =
    qualityColumns(col(textCol)).foldLeft(docs) { case (df, (n, c)) => df.withColumn(n, c) }

  // ------------------------------------------------------------ language id

  /** Stopword-hit language id: score each candidate language by the
    * fraction of its stopword list present in the document's token
    * set; argmax with deterministic tie-break (lexicographic lang). A
    * cheap n-gram-free heuristic good enough for corpus bucketing.
    *
    * Implementation note: the token set is materialized ONCE in a
    * `__words` column and the argmax is a single array_max over
    * (score, -rank) structs — a naive nested when()-reduce duplicates
    * the whole scoring expression ~3^k times and was measured orders
    * slower. */
  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val withWords = docs.withColumn("__words",
      array_distinct(filter(split(lower(col(textCol)), "\\W+"), t => length(t) > 0)))
    val scored = Stopwords.lists.zipWithIndex.map { case ((lang, ws), i) =>
      val sw = array(ws.map(lit): _*)
      struct(
        (size(array_intersect(col("__words"), sw)).cast("double") / ws.size).as("score"),
        lit(-i).as("negRank"), // ties → lexicographically first lang
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    withWords
      .withColumn("lang_id",
        when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und")))
      .drop("__words")
  }

  // ---------------------------------------------------------- fingerprinting

  /** Winnowing-style document fingerprint: hash every word 5-gram,
    * keep the minimum hash per document window band — here reduced to
    * the classic "min of k-gram hashes per band" sketch of `bands`
    * longs. Deterministic, locality-sensitive to contiguous content;
    * the gram hash (StableHash.h60, non-negative) is reproducible by
    * an independent SQL oracle. */
  /** The hashed k-gram array (one sha-derived hash PER GRAM — this is
    * the expensive projection; keep it in its own column/Project). */
  def gramHashes(text: Column, k: Int = 5): Column = {
    import graft.functions.StableHash
    // tokens bound once (captured subtrees re-evaluate per element in
    // interpreted HOF lambdas — see Dedup.shingles)
    val toks0 = filter(split(lower(text), "\\W+"), t => length(t) > 0)
    element_at(
      transform(array(toks0), toks =>
        when(size(toks) >= k,
          transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
            i => StableHash.h60(concat_ws(" ", slice(toks, i + 1, lit(k))))))
          .otherwise(array(StableHash.h60(concat_ws(" ", toks))))),
      1)
  }

  /** Band mins over an already-hashed gram array column. */
  def fingerprintOf(gramHashCol: Column, bands: Int = 8): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => array_min(filter(gramHashCol, g => pmod(g, lit(bands)) === b)))

  /** One-expression form — ONLY for ad-hoc single use: higher-order
    * functions are interpreted and get no subexpression elimination,
    * so the gram-hash subtree embedded here is re-evaluated once per
    * band. withFingerprint splits the two projections instead
    * (CollapseProject keeps a non-cheap producer referenced `bands`
    * times in its own Project), hashing each gram exactly once —
    * measured 8× cheaper at bands=8. */
  def fingerprint(text: Column, k: Int = 5, bands: Int = 8): Column =
    fingerprintOf(gramHashes(text, k), bands)

  def withFingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("__gram_hashes", gramHashes(col(textCol)))
      .withColumn("fingerprint", fingerprintOf(col("__gram_hashes")))
      .drop("__gram_hashes")

  /** Flat fingerprint INDEX TABLE (doc_id, band, minhash) — the form a
    * fingerprint store actually is, and the scale path. Unlike the
    * array-column form above, nothing expensive lives inside a lambda:
    * gram STRINGS explode through a Generate (evaluated once per doc),
    * the sha-derived hash runs as a codegen'd projection once per gram
    * row, and the per-(doc, band) min is a map-side-combined hash
    * aggregation. Empty bands produce no row (the array form yields
    * null entries instead). Measured ~10× faster than the array form
    * at sf0.1 — interpreted higher-order lambdas re-evaluate captured
    * subtrees per element and per duplicated consumer (see
    * fingerprint()'s scaladoc), which relational operators avoid. */
  def fingerprintTable(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", k: Int = 5,
                       bands: Int = 8): DataFrame = {
    import graft.functions.StableHash
    // tokens BOUND ONCE via a one-element-array lambda: a `toks`
    // expression captured directly inside the window transform would
    // re-tokenize the document once per gram (interpreted HOF lambdas
    // re-evaluate captured subtrees per element — see Dedup.shingles)
    val toks0 = filter(split(lower(col(textCol)), "\\W+"), t => length(t) > 0)
    val gramStrings = element_at(
      transform(array(toks0), toks =>
        when(size(toks) >= k,
          transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
            i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
          .otherwise(array(concat_ws(" ", toks)))),
      1)
    docs
      .select(col(idCol), explode(gramStrings).as("gram"))
      .select(col(idCol), StableHash.h60(col("gram")).as("h"))
      .groupBy(col(idCol), pmod(col("h"), lit(bands)).as("band"))
      .agg(min(col("h")).as("minhash"))
  }
}

/** Tiny embedded stopword lists (public common-word lists). */
object Stopwords {
  import org.apache.spark.sql.functions.{array, lit}

  private def arr(ws: String*): Column = array(ws.map(lit): _*)
  private type Column = org.apache.spark.sql.Column

  val enWords = Seq("the", "of", "and", "to", "in", "a", "is", "that", "it",
    "was", "for", "on", "are", "with", "as", "be", "at", "by", "this", "have")
  val deWords = Seq("der", "die", "und", "das", "ist", "von", "mit", "den",
    "nicht", "ein", "eine", "auf", "für", "im", "sich", "des", "auch", "es", "an", "werden")
  val frWords = Seq("le", "la", "de", "et", "les", "des", "est", "un", "une",
    "du", "dans", "que", "qui", "pour", "sur", "pas", "au", "avec", "ce", "il")
  val esWords = Seq("el", "la", "de", "que", "y", "los", "en", "un", "una",
    "del", "las", "por", "con", "no", "se", "es", "para", "su", "al", "lo")

  val en: Column = arr(enWords: _*)
  val lists: Seq[(String, Seq[String])] = Seq(
    "de" -> deWords, "en" -> enWords, "es" -> esWords, "fr" -> frWords)
}
