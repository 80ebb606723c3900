package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for training-data pipelines: tokenization,
 * quality scoring, language identification, and document fingerprinting.
 *
 * No direct reference analog — pydantic validates individual values; these
 * generalize its string-constraint vocabulary
 * (`pydantic/_internal/_known_annotated_metadata.py:18-96`: min_length,
 * pattern, ascii rates) to corpus-level text quality signals.
 *
 * Everything is a pure `Column -> Column` function: per-row, shuffle-free,
 * whole-stage-codegen'd. At 100 TB these run as map-only passes over the
 * scan — the only shuffles in a text-quality pipeline are the final
 * aggregations callers add on top.
 */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, "\\s+")

  /** BPE-ish tokenization: letter runs | digit runs | single punctuation,
   * the shape byte-pair pretokenizers produce, so token counts approximate
   * LLM token budgeting. Extraction (not split) keeps the pattern inside
   * RE2's feature set — portable to the DuckDB oracle. */
  val bpePattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast(LongType)

  /** Quality signals: chars/token, stopword ratio, alpha ratio,
   * mean word length — the standard cheap filters (C4/Gopher-style) a
   * training pipeline gates documents on. */
  def charsPerToken(text: Column): Column =
    length(text).cast(DoubleType) / tokenCount(text)

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => lower(t).isin(stopwords: _*))).cast(DoubleType) /
      size(toks)
  }

  /** Fraction of characters that are letters — low values flag
   * boilerplate/binary-ish documents. */
  def alphaRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "\\p{L}", "")))
      .cast(DoubleType) / length(text)

  /**
   * Language identification by stopword-profile scoring: score(text, lang) =
   * |tokens ∩ profile(lang)| / |tokens|, argmax over languages.
   * An n-gram/stopword heuristic (the classic cheap langid); profiles are
   * tiny literal arrays so the whole thing is one codegen'd projection —
   * no joins, no shuffles, no UDF.
   *
   * Deterministic tie-break: higher score wins, then lexicographic lang.
   */
  def langId(text: Column, profiles: Map[String, Seq[String]]): Column = {
    val toks = tokens(lower(text))
    val scored: Seq[Column] = profiles.toSeq.sortBy(_._1).map {
      case (lang, words) =>
        struct(
          (size(filter(toks, t => t.isin(words: _*))).cast(DoubleType) /
            size(toks)).as("score"),
          lit(lang).as("lang"))
    }
    // array_max on struct(score, lang): max by score then by lang — but we
    // want ties broken by FIRST lang alphabetically, so invert: take max of
    // (score, reversed-rank) — simpler: reduce with explicit comparison.
    scored.reduce { (a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a)
    }.getField("lang")
  }

  /** Codegen'd language-ID over a whole table: explode tokens once, ONE
   * aggregation with a conditional-count per profile (map-side partial
   * agg), then the same earliest-argmax fold as [[langId]]. Identical
   * scores (count/len in exact double division); ~10x faster than the
   * interpreted array-lambda form on large corpora. Returns (id, lang_pred). */
  def langIdDf(df: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String,
               profiles: Map[String, Seq[String]]): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(tokens(lower(col(textCol)))).as("t"))
    val sorted = profiles.toSeq.sortBy(_._1)
    val aggs = sorted.map { case (lang, words) =>
      (sum(when(col("t").isin(words: _*), 1).otherwise(0)).cast(DoubleType) /
        count(lit(1))).as(s"__s_$lang")
    }
    val scored = toks.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val winner = sorted.map { case (lang, _) =>
      struct(col(s"__s_$lang").as("score"), lit(lang).as("lang"))
    }.reduce { (a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a)
    }
    scored.select(col("id"), winner.getField("lang").as("lang_pred"))
  }

  /** Default stopword profiles for the languages in the synthetic corpora.
   * Word lists are the top function words of each language (public
   * knowledge). */
  val defaultProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "pour", "que"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de", "para", "que"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3")
  )

  /**
   * Order-sensitive document fingerprint: a rolling polynomial hash over
   * token hashes, h = Σ_i (i+1) · H(token_i) mod M, with
   * H = first 15 hex chars of md5 (60-bit, engine-portable: DuckDB computes
   * the identical value, so the oracle can replay it).
   *
   * Unlike a set-based MinHash this distinguishes permutations — it is the
   * cheap "same bytes, same order" dedup key (reference analog: pydantic's
   * whole-value equality in Literal; generalized to long documents).
   */
  def fingerprint(text: Column, mod: Long = 1000000007L): Column = {
    val toks = tokens(text)
    val hashed = transform(toks, (t, i) =>
      (conv(substring(md5(t), 1, 15), 16, 10).cast(LongType) % mod) *
        ((i + 1).cast(LongType) % mod) % mod)
    aggregate(hashed, lit(0L), (acc, x) => (acc + x) % mod)
  }

  /** Portable 60-bit token hash shared with the DuckDB oracle:
   * first 15 hex chars of md5, parsed base-16. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  // ------------------------------------------------------------------ PII

  /** PII patterns shared by scan and redaction — deliberately limited to
   * syntax valid in BOTH Java regex and RE2 (the DuckDB oracle replays
   * them verbatim): email shapes, dotted IPv4, phone-like digit runs.
   * A production pipeline extends the table; the plumbing (map-only
   * count + global replace, fully codegen'd) is the point here. */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiPhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  /** Per-document PII hit counts: struct(n_email, n_ipv4, n_phone). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(PiiEmailRe)).cast(LongType).as("n_email"),
    regexp_count(text, lit(PiiIpv4Re)).cast(LongType).as("n_ipv4"),
    regexp_count(text, lit(PiiPhoneRe)).cast(LongType).as("n_phone"))

  /** Global PII redaction (emails first so their dotted domains never
   * partially survive as IP-ish tokens, then IPs, then phone runs). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailRe, "<EMAIL>"),
        PiiIpv4Re, "<IP>"),
      PiiPhoneRe, "<PHONE>")

  /**
   * Gopher-style repetition quality metrics (Rae et al. 2021, appendix
   * A1.1 repetition filters; the same family as C4's duplicate rules) per
   * document:
   *  - `dup_token_frac`: 1 - distinct(tokens)/tokens — the fraction of
   *    tokens that are repeats of an earlier token;
   *  - `top_bigram_frac`: 2·occurrences(most frequent bigram)/tokens —
   *    the fraction of tokens sitting inside copies of the top 2-gram.
   *
   * Plan shape (100-TB safe): ONE posexplode of the token array with the
   * next token fetched by `try_element_at(arr, pos+2)` — no per-doc
   * window, no HOF lambdas — then map-side-combined aggregations. Counts
   * are exact integers and each fraction is a single IEEE division, so
   * the DuckDB oracle replays bit-exactly.
   */
  def repetitionMetrics(df: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String,
                        persistTokens: Boolean = true,
                        stagingDir: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val toks0 = df
      .select(col(idCol).as("id"), split(col(textCol), " ").as("arr"))
      .select(col("id"), col("arr"),
        posexplode(col("arr")).as(Seq("pos", "tok")))
      .withColumn("bg",
        concat(col("tok"), lit(" "), try_element_at(col("arr"), col("pos") + 2)))
      .select("id", "tok", "bg")
    // two independent aggregations consume the exploded relation — persist
    // it (memory, spill to disk) so the text split/explode runs once, same
    // rationale as CorpusClean's staged persists. stagingDir is the 100-TB
    // form: parquet files instead of executor storage.
    val toks = stagingDir match {
      case Some(dir) =>
        toks0.write.mode("overwrite").parquet(dir)
        df.sparkSession.read.parquet(dir)
      case None if persistTokens =>
        toks0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      case None => toks0
    }
    val base = toks.groupBy("id").agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col("tok")).as("n_distinct"))
    val topBigram = toks.filter(col("bg").isNotNull)
      .groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max(col("c")).as("top_c"))
    base.join(topBigram, Seq("id"), "left")
      .select(col("id"),
        col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")).cast(DoubleType) /
          col("n_tokens")).as("dup_token_frac"),
        (coalesce(col("top_c"), lit(0L)).cast(DoubleType) * 2 /
          col("n_tokens")).as("top_bigram_frac"))
  }

  /**
   * Benchmark decontamination — the standard n-gram collision test a
   * training corpus runs against its eval sets (GPT-3's 13-gram filter;
   * 3-grams here are the same plumbing at test scale): per document, the
   * fraction of its word n-gram shingles that appear ANYWHERE in the
   * benchmark corpus. Shingles compare as 60-bit md5 ids ([[hash60]]) so
   * joins run on longs and an external oracle can replay exactly.
   *
   * Scale shape: the benchmark shingle set is tiny next to the corpus
   * (deduped, semi-join-only) — Spark broadcasts it, so the corpus never
   * shuffles; the per-doc counts are one map-side-combined aggregation.
   * Returns (id, n_shingles, n_hits, overlap_frac).
   */
  def decontaminate(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String,
                    bench: org.apache.spark.sql.DataFrame,
                    benchTextCol: String,
                    n: Int = 13): org.apache.spark.sql.DataFrame = {
    def sh(d: org.apache.spark.sql.DataFrame, id: Column, text: Column) =
      d.select(id.as("id"),
          explode(graft.dedup.Dedup.shingles(text, n)).as("sh"))
        .select(col("id"), hash60(col("sh")).as("sh")).distinct()
    val benchSet = sh(bench, lit(0L), col(benchTextCol))
      .select("sh").distinct()
    // corpus side through the codegen'd row form (same shingle set per
    // doc as the interpreted array lambda — shingleRows' duplicates
    // collapse in the distinct below; measured ~2x on this operator,
    // the array-HOF path is CodegenFallback and dominated the scan)
    val docSh = graft.dedup.Dedup.shingleRows(
        df.select(col(idCol), col(textCol)), idCol, textCol, n)
      .select(col("id"), hash60(col("sh")).as("sh")).distinct()
    docSh
      .join(benchSet.withColumn("__hit", lit(1)), Seq("sh"), "left")
      .groupBy("id").agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("__hit"), lit(0))).cast(LongType).as("n_hits"))
      .select(col("id"), col("n_shingles"), col("n_hits"),
        (col("n_hits").cast(DoubleType) / col("n_shingles"))
          .as("overlap_frac"))
  }

  /**
   * Deterministic per-stratum downsampling — the source-mixing step a
   * training pipeline runs to hit its data recipe: keep a row iff
   * `hash60(id) mod den < num` for its stratum's (num, den) rate.
   * Hash-based, so the SAME rows are kept across runs, engines and
   * resumes (no RNG state); map-only, no shuffle; strata absent from
   * `rates` keep everything.
   */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, idCol: String,
                       stratumCol: String,
                       rates: Map[String, (Long, Long)])
  : org.apache.spark.sql.DataFrame = {
    val keep = rates.foldLeft(lit(true)) { case (acc, (stratum, (num, den))) =>
      when(col(stratumCol) === stratum,
        pmod(hash60(col(idCol).cast(StringType)), lit(den)) < num)
        .otherwise(acc)
    }
    df.filter(keep)
  }

  /**
   * Balance to the rarest stratum — the data-recipe step where the rates
   * are SOLVED FROM the observed distribution instead of configured:
   * every stratum is deterministically downsampled to (in expectation)
   * the smallest stratum's size, via `hash60(id) mod n_s < n_min`. All
   * arithmetic is integer (the exact rational rate n_min/n_s), so the
   * kept set is bit-reproducible across engines, runs and resumes.
   *
   * NULL strata pass through unsampled and are excluded from the rate
   * computation (mirroring `stratifiedSample`'s unlisted-strata rule:
   * never drop what you can't classify — and never let a tiny null
   * stratum become n_min and gut every real stratum).
   *
   * Scale shape: one map-side-combined count per stratum (stratum-count
   * rows), a 1-row global min, both broadcast back onto a map-only
   * filter — no wide shuffle of the data itself.
   */
  def balanceStrata(df: org.apache.spark.sql.DataFrame, idCol: String,
                    stratumCol: String): org.apache.spark.sql.DataFrame = {
    val n = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("__ns"))
    val m = n.agg(min(col("__ns")).as("__nm"))
    df.join(broadcast(n), Seq(stratumCol), "left")
      .crossJoin(broadcast(m))
      .where(col(stratumCol).isNull ||
        pmod(hash60(col(idCol).cast(StringType)), col("__ns"))
          < col("__nm"))
      .drop("__ns", "__nm")
  }

  /**
   * Fixed-size overlapping token chunking — the context-window splitter
   * every training pipeline runs before tokenization proper: documents
   * become `ceil(n / stride)` chunks of up to `size` tokens starting
   * every `stride` tokens (overlap = size - stride carries context across
   * boundaries; the final chunk is short). Deterministic and purely
   * positional, so the same rows chunk identically across engines, runs
   * and resumes.
   *
   * Scale shape: map-only — split once, explode a `sequence` of chunk
   * ordinals, `slice` the shared token array per ordinal (no shuffle, no
   * UDF; the token array is evaluated once per input row and reused by
   * every chunk row). Output grows by the overlap factor only.
   */
  def chunkTokens(df: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, size: Int = 64, stride: Int = 48)
  : org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = split(col(textCol), " ")
    // ceil(n / stride) via double division then floor: token counts are
    // far below 2^52, so the double arithmetic is exact
    val nChunks = floor((org.apache.spark.sql.functions.size(toks) +
      (stride - 1)) / stride).cast("int")
    val chunk = slice(col("__toks"), col("chunk_id") * stride + 1, lit(size))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__nc") - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        org.apache.spark.sql.functions.size(chunk).as("n_tokens"),
        array_join(chunk, " ").as("chunk"))
  }

  /**
   * Corpus token-frequency quality stats — the LM-free half of the
   * CCNet-style frequency filter: per document, the mean corpus frequency
   * of its tokens, the fraction of rare tokens (corpus count <=
   * `rareMax`), and the distinct-token fraction. Low mean frequency /
   * high rare fraction marks gibberish and OCR noise; distinct fraction
   * near 0 marks repetition (complements [[repetitionMetrics]]). All
   * arithmetic stays rational — integer counts and single double
   * divisions — so the oracle replays bit-exact with no transcendental
   * (ln) cross-engine ulp risk.
   *
   * Scale shape: ONE explode feeds both sides — the vocabulary aggregate
   * (map-side-combined groupBy, one row per distinct token) and the
   * token->frequency equi-join back (AQE broadcasts the vocab side when
   * it fits, which it does after any realistic min-count prune); the
   * per-doc re-aggregate partial-combines map-side. Hot stopword tokens
   * skew the JOIN key only on the small side, so no salting is needed.
   */
  def tokenFreqStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, rareMax: Long = 2)
  : org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(split(col(textCol), " "))
      .as("__tok"))
    val freq = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__cnt"))
    toks.join(freq, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__cnt")).as("__sum_cnt"),
        sum(when(col("__cnt") <= rareMax, 1L).otherwise(0L)).as("n_rare"),
        countDistinct(col("__tok")).as("n_distinct"))
      .select(col(idCol), col("n_tokens"),
        (col("__sum_cnt").cast("double") / col("n_tokens").cast("double"))
          .as("mean_tok_freq"),
        (col("n_rare").cast("double") / col("n_tokens").cast("double"))
          .as("rare_frac"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_frac"))
  }

  /**
   * Bigram language-model log-likelihood scoring — the CCNet-style
   * perplexity quality filter (Wenzek et al. 2020 score Common-Crawl
   * text with a KenLM model; here the model is trained ON the corpus
   * itself in the same job, which is the self-perplexity variant used
   * for in-corpus outlier detection). Add-one-smoothed bigram
   * probabilities: lp(w1,w2) = ln((c(w1,w2)+1)/(c(w1·)+V)) with
   * c(w1·) the bigram-prefix count and V the distinct-token count.
   *
   * Exactness discipline: each DISTINCT bigram's log-prob is rounded
   * ONCE to BIGINT units of 1/scaleFp (round-half-away, the BM25/PSI
   * ln discipline — two engines' libm agree on the double, the
   * rounding pins the last ulp), and per-document scores are then
   * INTEGER sums of those units — associative, bit-identical at any
   * parallelism, independently replayable. No float ever crosses an
   * aggregation. The keep flag compares integers:
   * `sum_lp_fp >= thresholdFp · n_bigrams` (an average-log-prob floor
   * without the division — BIGINT `div` truncates toward zero in
   * Spark but floors in DuckDB, so the division form would flap on
   * negative scores).
   *
   * Shape at scale: one explode (map-only bigram emit), the count
   * aggregation (map-side combined; stop-bigram skew dies in the
   * combiner), the model join back on the bigram key (hash
   * co-partitioned equi-join — the model table is corpus-sized, NOT
   * broadcast), V as a 1-row broadcast, and the per-doc rollup.
   * Documents with fewer than two tokens have no bigrams and are
   * absent from the result (callers union them back as keep=false if
   * the gate should drop empties).
   *
   * @return (id, n_bigrams, sum_lp_fp, keep)
   */
  def bigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, scaleFp: Long = 10000L,
      thresholdFpPerBigram: Long = -90000L)
  : org.apache.spark.sql.DataFrame = {
    val arr = filter(split(col(textCol), " "), x => x =!= "")
    val toks = df.select(col(idCol), arr.as("__arr"))
    val bg = toks.filter(size(col("__arr")) >= 2)
      .withColumn("__a1", slice(col("__arr"), lit(1), size(col("__arr")) - 1))
      .withColumn("__a2", slice(col("__arr"), lit(2), size(col("__arr")) - 1))
      .select(col(idCol),
        explode(arrays_zip(col("__a1"), col("__a2"))).as("__z"))
      .select(col(idCol), col("__z.__a1").as("__w1"),
        col("__z.__a2").as("__w2"))
    val bgc = bg.groupBy("__w1", "__w2").agg(count(lit(1)).as("__c2"))
    val c1t = bgc.groupBy("__w1").agg(sum("__c2").as("__c1"))
    val vt = df.select(explode(filter(split(col(textCol), " "),
      x => x =!= "")).as("__tok"))
      .agg(countDistinct(col("__tok")).as("__v"))
    val lp = bgc.join(c1t, "__w1").crossJoin(broadcast(vt))
      .select(col("__w1"), col("__w2"),
        round(log((col("__c2") + lit(1.0)) /
          (col("__c1") + col("__v").cast("double"))) * lit(scaleFp), 0)
          .cast("long").as("__lp_fp"))
    bg.join(lp, Seq("__w1", "__w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("__lp_fp").as("sum_lp_fp"))
      .select(col(idCol), col("n_bigrams"), col("sum_lp_fp"),
        (col("sum_lp_fp") >= lit(thresholdFpPerBigram) * col("n_bigrams"))
          .as("keep"))
  }

  /**
   * Duplicated-span detection — the span-level companion of document
   * dedup (Lee et al. 2021, "Deduplicating Training Data Makes
   * Language Models Better", find EXACT substrings repeated across a
   * corpus; their suffix-array pass becomes a rolling fixed-width
   * token-window hash here, the distributed-friendly form). Every
   * w-token window (stride 1) is hashed; a span that occurs in ≥2
   * DISTINCT documents is reported with its occurrence counts and
   * its lexicographically-first (doc, position) representative — the
   * rows a span-removal pass consumes.
   *
   * Shape at scale: one explode (n_tokens rows per doc — the same
   * amplification the Jaccard shingler already pays), then ONE
   * map-side-combined aggregation keyed by the 60-bit span hash;
   * boilerplate mega-spans concentrate on one key the same way
   * stop-shingles do — the n_docs≥2 output filter runs after the
   * combiner, so the hot key costs one reducer row, not a blowup.
   * The window string is materialized per position (w× bytes); a
   * production pass at 100 TB would swap in the rolling Rabin hash
   * of [[fingerprint]] — the aggregation shape is identical, the
   * md5 form is what the oracle can replay verbatim.
   *
   * @param w window width in tokens; documents shorter than w emit
   *          nothing
   * @return (span_hash, n_docs, n_occ, first_doc, first_pos) —
   *         first_pos is 1-based
   */
  /** All w-token windows as (id, __p (1-based), __h hash60) rows —
   * shared by [[dupSpans]] (report) and [[spanScrub]] (remove). */
  private def spanRows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, w: Int): org.apache.spark.sql.DataFrame = {
    val arr = filter(split(col(textCol), " "), x => x =!= "")
    df.select(col(idCol), arr.as("__arr"))
      .filter(size(col("__arr")) >= w)
      .select(col(idCol), posexplode(transform(
        sequence(lit(1), size(col("__arr")) - (w - 1)),
        i => array_join(slice(col("__arr"), i, lit(w)), " "))))
      .select(col(idCol), (col("pos") + 1).cast(LongType).as("__p"),
        hash60(col("col")).as("__h"))
  }

  def dupSpans(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, w: Int = 20)
  : org.apache.spark.sql.DataFrame = {
    require(w >= 1)
    val spans = spanRows(df, idCol, textCol, w)
    spans.groupBy("__h")
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occ"),
        min(struct(col(idCol).as("d"), col("__p").as("p"))).as("__m"))
      .filter(col("n_docs") >= 2)
      .select(col("__h").as("span_hash"), col("n_docs"), col("n_occ"),
        col("__m.d").as("first_doc"), col("__m.p").as("first_pos"))
  }

  /**
   * Duplicated-span REMOVAL — the transformation half of Lee et al.
   * 2021 (their pipeline cuts every repeated substring occurrence but
   * one; removing rather than dropping whole documents is what
   * preserves the unique remainder of mostly-duplicated pages). For
   * every cross-document duplicated w-token span, the
   * lexicographically-first (doc, pos) occurrence is KEPT and every
   * other occurrence's w token positions are deleted; overlapping
   * span occurrences union their positions. The cleaned text is the
   * surviving tokens rejoined in order.
   *
   * Shapes: the span index of [[dupSpans]] (one explode + one
   * map-side-combined agg), the occurrence join back on the span
   * hash (hash co-partitioned), a position explode over REMOVED
   * occurrences only (w× rows on the duplicated slice, not the
   * corpus), one anti-join of token rows against removed positions,
   * and an order-restoring sort_array(collect_list(struct)) per doc —
   * the standard Spark idiom for deterministic in-doc order without a
   * window.
   *
   * @return (id, n_tokens, n_removed, cleaned_sha) — cleaned_sha is
   *         sha256 hex of the space-rejoined surviving tokens (empty
   *         string when everything was removed), the replay invariant
   */
  /**
   * Concat-and-chunk sequence packing — the canonical LLM training
   * batching step (concatenate the corpus in a fixed document order,
   * cut into fixed-length token blocks; GPT-style pipelines pack
   * exactly this way): each document is mapped to its token interval
   * [start_tok, start_tok + n_tok) in the concatenated stream and to
   * the block range [first_block, last_block] it lands in for block
   * size `seqLen`.
   *
   * The interesting part at 10^12 docs is the GLOBAL PREFIX SUM — a
   * naive `Window.orderBy(id)` with no partition key moves the whole
   * corpus through ONE window partition (Spark even warns). Here it
   * is the classic two-level distributed scan instead: docs bucket by
   * `id div bucketSize`; level 1 computes within-bucket running sums
   * (window PARTITIONED by bucket — parallel, bounded partitions);
   * level 2 prefix-sums the per-bucket totals, a table of
   * n/bucketSize rows (pick bucketSize ≈ √n and both levels stay
   * √n-sized; deeper corpora recurse the same step). The level-2
   * window runs on that small table only.
   *
   * Assumes dense ids (the packing order key); a sparse key would
   * first rank via the same two-level scan. Deterministic and
   * bit-identical at any parallelism: integer sums over a fixed
   * order.
   *
   * @return (id, n_tok, start_tok, first_block, last_block)
   */
  def packOrder(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, seqLen: Long = 2048L, bucketSize: Long = 1000L)
  : org.apache.spark.sql.DataFrame = {
    require(seqLen >= 1 && bucketSize >= 1)
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
      size(filter(split(col(textCol), " "), x => x =!= ""))
        .cast(LongType).as("n_tok"),
      expr(s"$idCol div ${bucketSize}L").as("__b"))
    // level 1: within-bucket running sum, parallel across buckets
    val w1 = Window.partitionBy("__b").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val l1 = toks.withColumn("__run", sum("n_tok").over(w1))
    // level 2: prefix over per-bucket totals — n/bucketSize rows only
    val w2 = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = toks.groupBy("__b").agg(sum("n_tok").as("__bt"))
      .select(col("__b"), coalesce(sum("__bt").over(w2), lit(0L))
        .as("__off"))
    l1.join(broadcast(offsets), "__b")
      .select(col(idCol), col("n_tok"),
        (col("__off") + col("__run") - col("n_tok")).as("start_tok"))
      .withColumn("first_block",
        expr(s"start_tok div $seqLen"))
      .withColumn("last_block", when(col("n_tok") === 0L,
          expr(s"start_tok div $seqLen"))
        .otherwise(expr(s"(start_tok + n_tok - 1) div $seqLen")))
  }

  def spanScrub(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, w: Int = 20)
  : org.apache.spark.sql.DataFrame = {
    require(w >= 1)
    // the narrow span index (id, pos, hash60) feeds the dup aggregate AND
    // the occurrence join — persisted so the interpreted span-hash explode
    // over the whole corpus runs ONCE, not twice (it is the operator's
    // dominant cost; the frame is 3 fixed-width columns, cheap to hold)
    val spans = spanRows(df, idCol, textCol, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = spans.groupBy("__h")
      .agg(countDistinct(col(idCol)).as("__nd"),
        min(struct(col(idCol).as("d"), col("__p").as("p"))).as("__m"))
      .filter(col("__nd") >= 2)
      .select(col("__h"), col("__m.d").as("__kd"), col("__m.p").as("__kp"))
    // removed positions are SMALL (w x the duplicated occurrences, never
    // the corpus) and consumed twice (affected-doc set + the anti-join)
    // — persisted so the span index upstream runs once
    val removedPos = spans.join(dup, "__h")
      .filter(!(col(idCol) === col("__kd") && col("__p") === col("__kp")))
      .select(col(idCol),
        explode(sequence(col("__p"), col("__p") + (w - 1))).as("__pos"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val affected = removedPos.select(col(idCol)).distinct()
    val toksArr = filter(split(col(textCol), " "), x => x =!= "")
    // Docs WITHOUT removals — the vast majority of any real corpus —
    // never explode: their cleaned text is the space-rejoined token
    // stream, computed row-locally (guide §8: the token explode +
    // anti-join + order-restoring regroup below now runs only over the
    // duplicated slice, not the whole corpus; the old form shuffled
    // every doc's token TEXT through two exchanges).
    val untouched = df.join(affected, Seq(idCol), "left_anti")
      .select(col(idCol),
        size(toksArr).cast(LongType).as("n_tokens"),
        lit(0L).as("n_removed"),
        sha2(array_join(toksArr, " "), 256).as("cleaned_sha"))
    val toks = df.join(affected, Seq(idCol), "left_semi")
      .select(col(idCol),
        posexplode(filter(split(col(textCol), " "), x => x =!= "")))
      .select(col(idCol), (col("pos") + 1).cast(LongType).as("__idx"),
        col("col").as("__tok"))
    val kept = toks.join(removedPos,
      toks(idCol) === removedPos(idCol) &&
        toks("__idx") === removedPos("__pos"), "left_anti")
    val cleaned = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("__idx"), col("__tok")))),
          s => s.getField("__tok")), " ").as("__txt"))
    df.join(affected, Seq(idCol), "left_semi")
      .select(col(idCol),
        size(toksArr).cast(LongType).as("n_tokens"))
      .join(cleaned, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_removed"),
        sha2(coalesce(col("__txt"), lit("")), 256).as("cleaned_sha"))
      .union(untouched)
  }
}
