package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.spec._
import graft.compile.ModelValidator
import graft.checks.{Drift, TableChecks}
import graft.data.SourceFilesGen
import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.{CodeOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * Every `queries` entry is one engine operator exercised over the driver's
 * parquet tables; `oracleSql` holds the DuckDB-equivalent SQL where the
 * operator is ANSI-expressible (others get the driver's rows-only check).
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Per-session parquet staging dir: tmpdir + the Spark applicationId
   * (unique per SparkSession), so concurrent runs (Verify alongside
   * Bench, or two users on one host) can never read each other's
   * half-written staged files; a shutdown hook removes the whole root
   * so staging never leaks across runs. */
  private val stagedRoots = scala.collection.mutable.Set[String]()
  private def stageDir(s: SparkSession, name: String): String = synchronized {
    val root = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_stage_${s.sparkContext.applicationId}")
    if (stagedRoots.add(root.getAbsolutePath)) {
      root.mkdirs()
      Runtime.getRuntime.addShutdownHook(new Thread(() => delTree(root)))
    }
    new java.io.File(root, name).getAbsolutePath
  }
  private def delTree(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(delTree)
    f.delete(); ()
  }

  // --- WARC shard synthesis shared by w_warc / w_pipeline ---------------
  private def h2(c: Column) = lpad(hex(c), 2, "0")
  private def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
    h2((c / 256).cast("int")))
  private def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
    le16h((c / 65536).cast("int")))

  /** One per-record gzip member (the Common Crawl layout): 10-byte
   * header, one stored-deflate block, REAL CRC32 (Spark's crc32 — the
   * JDK GZIPInputStream verifies it on inflate) + ISIZE trailer. */
  private def gzMember(rc: Column): Column = {
    val rb = encode(rc, "UTF-8")
    val rl = octet_length(rb)
    concat(unhex(concat(lit("1F8B080000000000000301"),
      le16h(rl), le16h(lit(65535) - rl))),
      rb,
      unhex(concat(le32h(crc32(rb)), le32h(rl))))
  }

  /** One WARC record with Content-Length computed from the block itself
   * (bytes, not chars); `uri` null for non-response types. */
  private def warcRec(typ: String, uri: Column, block: Column): Column = {
    val uriPart =
      if (uri == null) lit("")
      else concat(lit("WARC-Target-URI: "), uri, lit("\r\n"))
    concat(lit(s"WARC/1.0\r\nWARC-Type: $typ\r\n"), uriPart,
      lit("Content-Length: "), octet_length(block).cast("string"),
      lit("\r\n\r\n"), block, lit("\r\n\r\n"))
  }

  /** The documents-table constraint model: every field constrained the way
   * pydantic would (str length/pattern, enum membership, int range) with
   * thresholds chosen so real rows violate them (positive + negative cases). */
  val docModel: ModelSpec = ModelSpec("document", Seq(
    FieldSpec("doc_id", IntSpec(ge = Some(0))),
    FieldSpec("text", StrSpec(minLength = Some(100), maxLength = Some(500))),
    FieldSpec("lang", EnumSpec(Seq("en", "de", "fr"))),
    FieldSpec("source", StrSpec(pattern = Some("^src[0-9]+$"))),
    FieldSpec("n_chars", IntSpec(ge = Some(1), le = Some(1000)))
  ))

  /** Flagship: full validation of the synthetic source-code table at tiny
   * scale — generate, validate, return violation rows. */
  def entry(spark: SparkSession): DataFrame = {
    val df = SourceFilesGen.generate(spark, 5000L)
    val model = ModelSpec("source_file", Seq(
      FieldSpec("repo", StrSpec(pattern = Some("^[\\w.-]+/[\\w.-]+$"))),
      FieldSpec("path", StrSpec(minLength = Some(1))),
      FieldSpec("commit", StrSpec(pattern = Some("^[0-9a-f]{40}$"),
        minLength = Some(40), maxLength = Some(40))),
      FieldSpec("lang", EnumSpec(SourceFilesGen.langs)),
      FieldSpec("content", NullableSpec(StrSpec(maxLength = Some(1000000))))
    ))
    ModelValidator.violations(df, model, Seq("id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- model validation: per-row verdict (model_fields error
    // accumulation -> valid flag)
    "v_verdict" -> ((s, dir) => {
      ModelValidator.validate(t(s, dir, "documents"), docModel)
        .select(col("doc_id"), col("valid"))
    }),

    // ---- violation sink: exploded ValidationError.errors() rows
    "v_violations" -> ((s, dir) => {
      ModelValidator.violations(t(s, dir, "documents"), docModel, Seq("doc_id"))
        .select(col("doc_id"), element_at(col("loc"), 1).as("field"),
          col("type").as("vtype"))
    }),

    // ---- model-level (cross-field) validators: the columnar
    // @model_validator(mode='after') — three ModelChecks over the
    // COERCED doc struct (one never fires: n_chars==len(text) holds by
    // construction, pinning the no-false-positive side), errors land
    // at the model root (loc=(), n_loc=0) as value_error with
    // ctx.error, and the reference's gating is visible in the rows:
    // docs with FIELD violations never get model rows
    "v_cross" -> ((s, dir) => {
      val m = docModel.copy(modelChecks = Seq(
        ModelCheck("len_match",
          st => st.getField("n_chars") === length(st.getField("text")),
          "n_chars must equal len(text)"),
        ModelCheck("even_chars",
          st => st.getField("n_chars") % 2 === 0,
          "n_chars must be even"),
        ModelCheck("en_min_len",
          st => st.getField("lang") =!= "en" ||
            st.getField("n_chars") >= 250L,
          "english docs need >= 250 chars")))
      ModelValidator.violations(t(s, dir, "documents"), m, Seq("doc_id"))
        .select(col("doc_id"), size(col("loc")).cast("long").as("n_loc"),
          col("type").as("vtype"), col("ctx").getItem("error").as("err"))
    }),

    // ---- violation regression diff (CI-for-data): current violations vs
    // a deterministic "previous snapshot" (a doc_id%7 slice didn't exist
    // yet -> its violations are `new`; a doc_id%5 slice had NULL lang,
    // since repaired -> `fixed`); everything else `persisting`. The alert
    // gate of a scheduled validation run is status='new'.
    "v_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val prevDocs = d.filter(col("doc_id") % 7 =!= 0)
        .withColumn("lang", when(col("doc_id") % 5 === 0,
          lit(null).cast("string")).otherwise(col("lang")))
      def v(x: DataFrame) =
        ModelValidator.violations(x, docModel, Seq("doc_id"))
          .select(col("doc_id"), element_at(col("loc"), 1).as("field"),
            col("type").as("vtype"))
      TableChecks.violationDiff(v(d), v(prevDocs),
        Seq("doc_id", "field", "vtype"))
    }),

    // ---- per-column stats, exact flavor for oracle parity in ONE scan:
    // a single aggregation computes every column's stats (the exact
    // countDistincts expand the input 3x but read it once — round 1 ran
    // three separate full scans), then explode unpivots to one row per
    // column. The HLL++/approx_percentile flavor for 100TB runs is
    // TableChecks.columnStats (bench + Runner path).
    "v_col_stats" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val cols = Seq("lang", "source", "n_chars")
      val aggs = count(lit(1)).as("row_count") +: cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"dc_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c")))
      val agg = d.agg(aggs.head, aggs.tail: _*)
      val rows = cols.map(c => struct(
        lit(c).as("col_name"), col("row_count"),
        col(s"nn_$c").as("nonnull_count"), col(s"dc_$c").as("distinct_ct"),
        col(s"mn_$c").as("min_value"), col(s"mx_$c").as("max_value")))
      agg.select(explode(array(rows: _*)).as("r")).select("r.*")
    }),

    // ---- uniqueness (set semantics at table level): duplicated keys
    "v_unique_dups" -> ((s, dir) => {
      TableChecks.duplicateKeys(t(s, dir, "documents"), Seq("lang", "source"))
    }),

    // ---- referential integrity: broadcast anti-join vs language dim
    "v_ri_lang" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq("en", "de", "fr", "es").toDF("lang")
      TableChecks.referentialViolations(t(s, dir, "documents"), "lang", dim, "lang")
        .select(col("doc_id"), col("lang"))
    }),

    // ---- distribution drift: PSI per source vs global, closed form
    "v_drift_psi" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val hist = Drift.histogram(d, col("source"),
        Drift.bucketize(col("n_chars"), 0, 600, 20))
      val ref = hist.groupBy("bucket").agg(sum("cnt").as("ref_cnt"))
      Drift.psi(hist, ref).select(col("part"), round(col("psi"), 4).as("psi"))
    }),

    // ---- distribution drift: KS per source vs global
    "v_drift_ks" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val hist = Drift.histogram(d, col("source"),
        Drift.bucketize(col("n_chars"), 0, 600, 20))
      val ref = hist.groupBy("bucket").agg(sum("cnt").as("ref_cnt"))
      Drift.ks(hist, ref).select(col("part"), round(col("ks"), 4).as("ks"))
    }),

    // ---- distribution drift: Wasserstein-1 + Jensen-Shannon per source vs
    // global (the magnitude-weighted and symmetric-bounded complements of
    // KS/PSI over the same histogram — one groupBy, tiny grid joins)
    "v_drift_w1" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val hist = Drift.histogram(d, col("source"),
        Drift.bucketize(col("n_chars"), 0, 600, 20)).cache()
      val ref = hist.groupBy("bucket").agg(sum("cnt").as("ref_cnt"))
      Drift.wasserstein(hist, ref, binWidth = 30.0)
        .join(Drift.jsd(hist, ref), Seq("part"))
        .select(col("part"), round(col("w1"), 4).as("w1"),
          round(col("jsd"), 6).as("jsd"))
    }),

    // ---- constraint-spec inference: profile a sample and suggest the
    // model (kind/nullable/bounds/enum/pattern decision table per column —
    // the spec-bootstrap flow; SpecInfer.infer builds the ModelSpec from
    // the same stats and its validation accepts the sample)
    "i_infer" -> ((s, dir) => SpecInfer.profile(t(s, dir, "events"))),

    // ---- CI-for-schemas: infer the spec of two corpus snapshots and diff
    // them — B drops `source` (breaking), truncates `text` to 120 chars
    // (len_narrowed, breaking), retypes `n_chars` int->float (kind,
    // breaking) and adds `n_tokens` (compatible); `doc_id`/`lang` unchanged
    "i_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val a = d.select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
      val b = d.select(col("doc_id"),
        substring(col("text"), 1, 120).as("text"), col("lang"),
        col("n_chars").cast("double").as("n_chars"),
        size(split(col("text"), " ")).as("n_tokens"))
      SpecDiff.profileDiff(SpecInfer.profile(a), SpecInfer.profile(b))
    }),

    // ---- Json[T] validation: parse-then-validate fused in one projection
    "v_json_field" -> ((s, dir) => {
      t(s, dir, "events").select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
    }),

    // ---- validation: allow_partial JSON recovery (pydantic-core
    // validators/mod.rs:183-304 / jiter partial modes) — a fixed-layout
    // doc truncated at every position, completed in both modes
    "v_json_partial" -> ((s, dir) => {
      import graft.functions.JsonPartialOps
      val nnn = (lit(100) + pmod(col("doc_id"), lit(900))).cast("string")
      val j = concat(lit("{\"k\": "), nnn,
        lit(", \"tags\": [\"alpha\", \"beta\"], \"note\": \"text\"}"))
      val p = (pmod(col("doc_id"), lit(jpTemplate.length)) + 1).cast("int")
      t(s, dir, "documents")
        .select(col("doc_id"), j.substr(lit(1), p).as("__c"))
        .select(col("doc_id"),
          JsonPartialOps.completeJson(col("__c")).as("jon"),
          JsonPartialOps.completeJson(col("__c"), trailingStrings = true)
            .as("jts"))
    }),

    // ---- relational: group agg (TPC-H Q1 shape). Money in integer cents —
    // exact, engine-independent arithmetic for the oracle compare.
    "q1_agg" -> ((s, dir) => {
      val priceCents = round(col("l_extendedprice") * 100).cast("long")
      val discE2 = round(col("l_discount") * 100).cast("long")
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("long")).as("sum_qty"),
          sum(priceCents * (lit(100L) - discE2)).as("revenue_e4"),
          count(lit(1)).as("n"))
    }),

    // ---- relational: broadcast join + agg
    "q_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
    }),

    // ---- window top-k per group (total order via tiebreaker)
    "q_window_top3" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    }),

    // ---- exact dedup (hash-groupBy): canonical id + multiplicity per text
    "d_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents").groupBy(col("text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
        .select(col("keep_id"), col("copies"))
    }),

    // ---- text: whitespace token count
    "t_token_count" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    }),

    // ---- text: quality scoring (chars/token + stopword ratio)
    "t_quality" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks)
      val nStop = size(filter(toks, x => x.isin("the", "a", "of", "and", "to")))
      t(s, dir, "documents").select(col("doc_id"),
        round(length(col("text")).cast("double") / nTok, 3).as("chars_per_token"),
        round(nStop.cast("double") / nTok, 4).as("stopword_ratio"))
    }),

    // ---- pipeline: per-source dataset card — the summary a training-data
    // pipeline publishes per corpus slice: doc/char/token counts, language
    // mix, exact-dup rate. One aggregation pyramid (groupBy source), all
    // counts exact ints, rates a single division each.
    "p_dataset_card" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val nTok = size(split(col("text"), " ")).cast("long")
      val perSource = d.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        sum(nTok).as("n_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(when(col("lang") === "de", 1L).otherwise(0L)).as("n_de"),
        sum(when(col("lang") === "fr", 1L).otherwise(0L)).as("n_fr"),
        countDistinct(sha2(col("text"), 256)).as("n_unique"))
      perSource.select(col("source"), col("n_docs"), col("n_chars"),
        col("n_tokens"), col("n_en"), col("n_de"), col("n_fr"),
        ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs"))
          .as("dup_rate"))
    }),

    // ---- text: Gopher-style repetition metrics (duplicate-token and
    // top-bigram fractions — the standard corpus-quality repetition rules)
    "t_repetition" -> ((s, dir) => {
      TextOps.repetitionMetrics(t(s, dir, "documents"), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- text: BPE-ish token count (regex pretokenizer)
    "t_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe"))
    }),

    // ---- text: language identification (stopword-profile argmax)
    "t_lang_id" -> ((s, dir) => {
      TextOps.langIdDf(t(s, dir, "documents"), "doc_id", "text",
        TextOps.defaultProfiles).withColumnRenamed("id", "doc_id")
    }),

    // ---- text: order-sensitive rolling-hash document fingerprint
    "t_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fp"))
    }),

    // ---- text: benchmark decontamination (GPT-3-style n-gram collision
    // test; 3-grams at test scale) — docs sharing shingles with a pseudo
    // eval set (every 97th doc) get their overlap fraction measured;
    // the benchmark shingle set broadcasts, the corpus never shuffles
    "t_decontam" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      TextOps.decontaminate(docs, "doc_id", "text", bench, "text", n = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- text: deterministic stratified downsampling (data-recipe
    // mixing): keep 1/2 of en, 1/4 of zh, everything else — hash-gated,
    // so the SAME rows survive across engines/runs/resumes
    "t_sample" -> ((s, dir) => {
      TextOps.stratifiedSample(t(s, dir, "documents"), "doc_id", "lang",
        Map("en" -> ((1L, 2L)), "zh" -> ((1L, 4L))))
        .select("doc_id", "lang", "source")
    }),

    // ---- code: The-Stack-style per-file quality metrics (Kocetkov et
    // al. 2022 §2.2) over the BASELINE input-shape table
    // (repo,path,commit,lang,content) with opt-in pathologies (autogen
    // headers, minified one-liners, comment-heavy files). The generated
    // input persists to a fixed path so the DuckDB oracle replays every
    // metric — line stats, comment fraction, alnum fraction, autogen
    // flag — over the exact same rows.
    "c_quality" -> ((s, dir) =>
      CodeOps.codeQuality(codeInput(s), "id", "lang", "content")),

    // ---- code: Stack-gate keep/drop verdict, first failing rule as the
    // drop reason (rule order: autogenerated, long_line, mean_line,
    // low_alnum)
    "c_filter" -> ((s, dir) =>
      CodeOps.codeFilter(
        CodeOps.codeQuality(codeInput(s), "id", "lang", "content"))),

    // ---- code: credential scan + global redaction (BigCode-style secret
    // removal: AWS key ids, forge tokens, PEM blocks) — counts AND the
    // redacted-content sha, both replayed verbatim by the oracle
    "c_secrets" -> ((s, dir) =>
      CodeOps.secretScan(codeInput(s), "id", "content")),

    // ---- code: license detection (SPDX header first, classic license-text
    // phrases second) + The-Stack permissive-only keep policy
    "c_license" -> ((s, dir) =>
      CodeOps.licenseScan(codeInput(s), "id", "content")),

    // ---- code: cross-file boilerplate-line scan (CCNet/Stack line-level
    // dedup signal) — per file, distinct non-blank lines whose document
    // frequency reaches 20 (license headers, vendored prologues); only
    // 8-byte line hashes shuffle, never line text
    "c_boilerplate" -> ((s, dir) =>
      CodeOps.boilerplateScan(codeInput(s), "id", "content", minDf = 20L)),

    // ---- code: path-extension vs declared-lang referential parity (null
    // path / unknown lang -> unverifiable -> false)
    "c_ext_lang" -> ((s, dir) =>
      CodeOps.extLangCheck(codeInput(s), "id", "path", "lang",
        SourceFilesGen.langs)),

    // ---- code: content-based language detection (guesslang-lite) —
    // cross-check of declared lang metadata against what the bytes look
    // like; same-syntax families (java/scala, c/cpp, js/ts) reported as
    // ties, never guessed; map-only, zero shuffles
    "c_lang_detect" -> ((s, dir) =>
      CodeOps.langDetect(codeInput(s), "id", "lang", "content")),

    // ---- code: per-repo composition by path family (vendored/generated/
    // test/docs/source) — the card The-Stack-style vendored-tree drops and
    // test-share quality signals read; map-only CASE + one agg
    "c_paths" -> ((s, dir) =>
      CodeOps.pathStats(codeInput(s), "repo", "path")),

    // ---- code: Jupyter-notebook cell extraction from raw ipynb JSON
    // (from_json -> explode cells -> explode lines -> one agg); malformed
    // documents flagged valid=0, never thrown
    "c_notebook" -> ((s, dir) =>
      CodeOps.notebookStats(nbInput(s), "nb_id", "nb_json")),

    // ---- code: cyclomatic-lite complexity + indentation-depth gate
    // (defs + branch keywords, 4-space depth ladder) — map-only, codegen'd
    "c_complexity" -> ((s, dir) =>
      CodeOps.codeComplexity(codeInput(s), "id", "lang", "content")),

    // ---- code: cross-file duplicate-definition scan (symbols defined in
    // 2+ files — template/boilerplate mass + name-collision report);
    // per-file array_distinct before the explode, one two-distinct hash agg
    "c_symbols" -> ((s, dir) =>
      CodeOps.symbolCollisions(codeInput(s), "id", "repo", "content")),

    // ---- code: per-repo corpus card (files, langs, chars, autogen +
    // secret-bearing counts) — one algebraic hash aggregate, mega-repo-safe
    "c_repo_card" -> ((s, dir) =>
      CodeOps.repoCard(codeInput(s), "repo", "lang", "content")),

    // ---- code: near-duplicate pairs over NORMALIZED code (lowercased,
    // punctuation collapsed — formatting/minification-invariant), reusing
    // the exact prefix-filtered All-Pairs operator; the generator's
    // boilerplate-template pathology supplies true near-dup blocks
    "c_near_dup" -> ((s, dir) => {
      // quality gate FIRST (published pipeline order) — also the scale
      // guard: it drops the signal-free files (e.g. alnum-free separator
      // soup) whose identical empty token streams would otherwise form an
      // O(n^2) J=1 clique in the pair output
      val base = codeInput(s)
      val keep = CodeOps.codeFilter(
          CodeOps.codeQuality(base, "id", "lang", "content"))
        .filter(col("keep")).select("id")
      // the shared near-dup recipe (comment-strip before normalizing —
      // license/autogen headers otherwise weld unrelated files into
      // cliques; signal-free files dropped): CodeOps.nearDupNorm, the
      // same definition CodeClean composes
      val norm = CodeOps.nearDupNorm(base.join(keep, "id"))
      Dedup.jaccardNgramPairs(norm, "id", "norm",
        shingleN = 3, thrNum = 1L, thrDen = 2L,
        stagingDir = Some(stageDir(s, "code_jaccard")))
    }),

    // ---- code: the END-TO-END Stack-style cleaning pipeline — quality
    // gate -> license policy -> secret redaction -> boilerplate-line
    // strip -> near-dup drop, composed from the individually-oracled
    // operators; the sha256 of each survivor's final rewritten content
    // proves the WHOLE pipeline bit-exact, not just row membership
    "p_code_clean" -> ((s, dir) =>
      graft.text.CodeClean.run(codeInput(s),
        stagingDir = Some(stageDir(s, "code_clean")))),

    // ---- code: ecosystem dependency stats — per-lang import extraction
    // (line-anchored patterns, Java∩RE2), per-file dedup, then one hash
    // aggregate: which modules the corpus imports and how widely (the
    // library-popularity / repo-selection signal in dataset curation)
    "c_imports" -> ((s, dir) =>
      CodeOps.importStats(codeInput(s), "repo", "lang", "content")),

    // ---- code: repo-level fork/mirror detection by file-set containment
    // (The-Stack drops forks before training cuts; content-level overlap
    // is the signal when fork metadata is absent). df-guarded equi-join —
    // per-file pair fan-out bounded by C(maxDf,2)
    "c_forks" -> ((s, dir) =>
      CodeOps.forkDetect(forkInput(s), "repo", "path", "content",
        stagingDir = Some(stageDir(s, "forks")))),

    // ---- text: fixed-size overlapping token chunking (context-window
    // splitter; deterministic positional slices) — map-only explode+slice
    "t_chunks" -> ((s, dir) =>
      TextOps.chunkTokens(t(s, dir, "documents"), "doc_id", "text",
        size = 64, stride = 48)),

    // ---- text: corpus token-frequency quality stats (CCNet-style
    // frequency filter, LM-free: mean corpus token frequency, rare-token
    // and distinct-token fractions) — explode once, vocab agg, equi-join
    // back, per-doc reagg; all-rational arithmetic for the oracle
    "t_tok_freq" -> ((s, dir) =>
      TextOps.tokenFreqStats(t(s, dir, "documents"), "doc_id", "text")),

    // ---- text: bigram-LM perplexity quality filter (the CCNet score,
    // self-trained add-one bigram model) — per-distinct-bigram ln
    // rounded ONCE to 1e-4 units, per-doc scores are then integer
    // sums (associative, bit-identical); keep flag is an integer
    // average-log-prob floor without division (BIGINT div truncates
    // in Spark but floors in DuckDB on negatives)
    "t_ppl" -> ((s, dir) =>
      TextOps.bigramLogProb(t(s, dir, "documents"), "doc_id", "text")),

    // ---- text: duplicated-span detection (Lee et al. 2021 substring
    // dedup, rolling 20-token-window form) — spans repeated across >= 2
    // distinct docs, one explode + ONE map-side-combined agg on the
    // 60-bit span hash; representative (doc,pos) via min(struct)
    "t_dup_spans" -> ((s, dir) =>
      TextOps.dupSpans(t(s, dir, "documents"), "doc_id", "text", w = 20)),

    // ---- text: concat-and-chunk sequence packing (the LLM batching
    // step) — each doc's token interval and 2048-token block range in
    // the concatenated corpus stream; the global prefix sum is the
    // two-level distributed scan, never a whole-corpus window
    "t_pack" -> ((s, dir) =>
      TextOps.packOrder(t(s, dir, "documents"), "doc_id", "text",
        seqLen = 2048L, bucketSize = 64L)),

    // ---- text: duplicated-span REMOVAL (the Lee et al. transformation
    // half): every non-canonical occurrence's 20 tokens deleted,
    // overlaps unioned, survivors rejoined in order; the cleaned-text
    // sha256 is the replay invariant
    "t_span_scrub" -> ((s, dir) =>
      TextOps.spanScrub(t(s, dir, "documents"), "doc_id", "text", w = 20)),

    // ---- text: PII scan + redaction (emails / IPv4 / phone runs) —
    // counts and a redacted-text hash, both replayed verbatim by the
    // oracle (patterns restricted to the Java-regex ∩ RE2 dialect)
    "t_pii" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(3)).cast("int")
      val injected = when(m === 0, lit("no personal data here"))
        .when(m === 1, concat(lit("mail bob"),
          pmod(col("doc_id"), lit(10)).cast("string"),
          lit("@example.com now")))
        .otherwise(concat(lit("ip 10.1."),
          pmod(col("doc_id"), lit(200)).cast("string"),
          lit(".7 and a@b.io plus tel +1 555-000-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      val pii = concat(col("text"), lit(" "), injected)
      val cnts = TextOps.piiCounts(pii)
      t(s, dir, "documents").select(col("doc_id"),
        cnts.getField("n_email").as("n_email"),
        cnts.getField("n_ipv4").as("n_ipv4"),
        cnts.getField("n_phone").as("n_phone"),
        sha2(TextOps.redactPii(pii), 256).as("redacted_sha"))
    }),

    // ---- dedup: MinHash signatures (4 permutations, md5-portable)
    "d_minhash_sig" -> ((s, dir) => {
      Dedup.minhashSignatureDf(t(s, dir, "documents"), "doc_id", "text",
        k = 4, shingleN = 3).withColumnRenamed("id", "doc_id")
    }),

    // ---- dedup: MinHash-LSH near-dup pairs (12 hashes, 4 bands x 3,
    // Jaccard-verified >= 0.5)
    "d_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 12, bands = 4, shingleN = 3, threshold = 0.5)
    }),

    // ---- pipeline: end-to-end corpus cleaning (exact dedup -> near-dup
    // removal -> language filter -> quality filter) — the composition a
    // training-data pipeline runs before tokenization
    "p_corpus_clean" -> ((s, dir) => {
      // parquet-staged intermediates (the 100-TB form — and the timed
      // bench run's re-materialization is I/O-shaped, not shuffle-shaped)
      graft.text.CorpusClean.clean(t(s, dir, "documents"), "doc_id", "text",
        TextOps.defaultProfiles, keepLangs = Seq("en"),
        minTokens = 10, maxCharsPerToken = 8.0,
        stagingDir = Some(stageDir(s, "corpus")))
        .withColumnRenamed("id", "doc_id")
    }),

    // ---- dedup: EXACT n-gram Jaccard pairs (prefix-filtered All-Pairs;
    // the deterministic counterpart to d_minhash_lsh — same threshold)
    "d_jaccard_ngram" -> ((s, dir) => {
      // shingle index staged to parquet (Dedup scaladoc's own scale
      // recommendation): the All-Pairs inverted index is written once and
      // read by the prefix + verify joins as files
      Dedup.jaccardNgramPairs(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, thrNum = 1L, thrDen = 2L,
        stagingDir = Some(stageDir(s, "jaccard")))
    }),

    // ---- dedup: 60-bit SimHash fingerprints (codegen'd explode+agg path)
    "d_simhash" -> ((s, dir) => {
      Dedup.simhashDf(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").as("doc_id"), col("sig"))
    }),

    // ---- dedup: SimHash near-dup pairs, hamming <= 3 via exact 4-chunk
    // banding (pigeonhole: no false negatives)
    "d_simhash_pairs" -> ((s, dir) => {
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, chunks = 4)
        .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
    }),

    // ---- dedup: connected components over the simhash near-dup pairs —
    // pair edges -> transitive groups (component = min doc id), the step
    // that makes "keep one per group" correct when a~b, b~c but the a~c
    // edge was never emitted. Oracle replays with a recursive CTE.
    "d_components" -> ((s, dir) => {
      val pairs = Dedup.simhashPairs(t(s, dir, "documents"), "doc_id",
        "text", maxHamming = 3, chunks = 4)
      Dedup.connectedComponents(pairs)
        .select(col("id").cast("long").as("id"),
          col("component").cast("long").as("component"))
    }),

    // ---- similarity: brute-force cosine top-5 (8 query vectors broadcast
    // against the corpus)
    "s_ann_brute" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, dim = 64)
    }),

    // ---- similarity: LSH-bucketed approximate top-3. Plane count scales
    // with the corpus (~32 vectors/bucket), degenerate buckets dropped,
    // vectors pre-normalized so each candidate costs one dot product.
    "s_ann_lsh" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val planes = Similarity.portablePlanes(
        Similarity.planesForCount(e.count(), targetLoad = annTargetLoad), 64)
      Similarity.annLsh(e, e, "vec_id", "embedding", "vec_id", "embedding",
        k = 3, planes = planes, maxBucket = simMaxBucket)
    }),

    // ---- similarity: MULTI-TABLE LSH top-3 (3 independent plane sets,
    // recall 1-(1-p)^3; one (table,bucket) equi-join, pairs deduped
    // before scoring)
    "s_ann_multi" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val np = Similarity.planesForCount(e.count(), targetLoad = annTargetLoad)
      val sets = Similarity.portablePlanes(3 * np, 64).grouped(np).toSeq
      Similarity.annLshMulti(e, e, "vec_id", "embedding", "vec_id",
        "embedding", k = 3, planeSets = sets, maxBucket = simMaxBucket)
    }),

    // ---- similarity: IVF ANN top-3 — corpus partitioned into 8 centroid
    // cells (portable md5-ordered seeds so the oracle replays them),
    // queries probe their 2 nearest cells, candidates ranked by exact
    // cosine over pre-normalized vectors
    "s_ann_ivf" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = Similarity.ivfCentroidsPortable(e, "vec_id", "embedding",
        k = ivfCells)
      Similarity.annIvf(e.filter(col("vec_id") < 8), e, "vec_id", "embedding",
        "vec_id", "embedding", k = 3, dim = 64, centroids = cents,
        nprobe = ivfNprobe)
    }),

    // ---- similarity: embedding-cosine near-dup pairs (cos>=0.4), plane
    // count scaled to ~8 vectors/bucket — candidate pairs stay ~n·load at
    // any corpus size (round-1 used a FIXED 4 planes: O(n²/16))
    "s_near_dup" -> ((s, dir) => {
      Similarity.nearDupPairsAuto(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.4, dim = 64,
        targetLoad = ndTargetLoad, maxBucket = simMaxBucket)
    }),

    // ---- partition verdicts: per-partition pass/fail from violation rate
    // (the Runner's checkpoint row, expressed over the documents table with
    // `source` as the partition key so DuckDB can replay it)
    "v_part_verdict" -> ((s, dir) => {
      ModelValidator.plan(t(s, dir, "documents"), docModel)
        .groupBy(col("source").as("part_id"))
        .agg(count(lit(1)).as("row_count"),
          sum(size(col(ModelValidator.VIOLATIONS))).as("violation_count"),
          sum(when(col(ModelValidator.VALID), 0L).otherwise(1L)).as("invalid_rows"))
        .withColumn("passed",
          col("invalid_rows").cast("double") / col("row_count") <= 0.5)
    }),

    // ---- freshness SLA: per event_type newest timestamp vs the global
    // newest, stale when lag > 20min — exact integer microseconds end to
    // end; one groupBy + a 1-row broadcast
    "v_freshness" -> ((s, dir) =>
      TableChecks.freshness(t(s, dir, "events"), col("event_type"),
        col("ts"), maxLagSec = 1200L)),

    // ---- event-time: backward as-of join — every click enriched with the
    // user's latest purchase value at-or-before it (union-window form, one
    // key exchange, no candidate pairs; DuckDB ASOF JOIN is the oracle).
    // Right side pre-aggregated to unique (user, ts) — both the engine
    // and SQL ASOF are nondeterministic under right-side duplicates
    "e_asof" -> ((s, dir) => {
      import graft.events.EventOps
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purch = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      EventOps.asofJoin(clicks, purch, Seq("user_id"), "ts", "ts",
          Seq("pval"))
        .select(col("event_id"), col("user_id"),
          EventOps.tsMicros(col("ts")).as("click_us"),
          col("pval").as("last_purchase"), col("asof_lag_us"))
    }),

    // ---- event-time: FORWARD as-of — every click paired with the user's
    // NEXT purchase at-or-after it (time-to-conversion); same union-window
    // plan, reversed order
    "e_asof_fwd" -> ((s, dir) => {
      import graft.events.EventOps
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purch = ev.where(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("pval"))
      EventOps.asofJoin(clicks, purch, Seq("user_id"), "ts", "ts",
          Seq("pval"), forward = true)
        .select(col("event_id"), col("user_id"),
          EventOps.tsMicros(col("ts")).as("click_us"),
          col("pval").as("next_purchase"),
          (-col("asof_lag_us")).as("lead_us"))
    }),

    // ---- event-time: gap sessionization (30-min inactivity) + session
    // rollup. Money stays exact end-to-end: DECIMAL(18,2) sum rendered as
    // integer cents, so the fold order of a double sum can never leak in
    "e_sessions" -> ((s, dir) => {
      import graft.events.EventOps
      EventOps.sessionSummary(t(s, dir, "events"), Seq("user_id"), "ts",
          "event_id", gapUs = 1800L * 1000000L, "value", "event_type")
        .select(col("user_id"), col("session_seq"), col("n_events"),
          col("start_us"), col("end_us"), col("duration_us"),
          (col("sum_value") * 100).cast(org.apache.spark.sql.types.LongType)
            .as("sum_cents"),
          col("n_types"))
    }),

    // ---- event-time: per-event trailing 1h window (count + exact cents
    // sum). RANGE frame on integer micros — tie rows are peers in both
    // engines, so duplicate timestamps can't make the result order-dependent
    "e_rolling" -> ((s, dir) => {
      import graft.events.EventOps
      EventOps.rollingAgg(t(s, dir, "events"), Seq("user_id"), "ts",
          "value", windowUs = 3600L * 1000000L)
        .select(col("event_id"), col("user_id"),
          EventOps.tsMicros(col("ts")).as("us"), col("roll_n"),
          (col("roll_sum") * 100).cast(org.apache.spark.sql.types.LongType)
            .as("roll_cents"))
    }),

    // ---- event-time: interval (range) join via fixed-width binning —
    // clicks landing inside each purchase's 10-minute attribution window,
    // counted per purchase (zero-match purchases kept via the join back)
    "e_range" -> ((s, dir) => {
      import graft.events.EventOps
      val ev = t(s, dir, "events")
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purch = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts").as("start_ts"),
          (col("ts").cast("timestamp") + expr("INTERVAL 600 SECOND"))
            .as("end_ts"))
      val matched = EventOps.rangeJoinBinned(clicks, purch, Seq("user_id"),
        "ts", "start_ts", "end_ts", binWidthUs = 600L * 1000000L,
        Seq("event_id"), Seq("event_id"))
      val cnt = matched.groupBy(col("i_event_id").as("event_id"))
        .agg(count(lit(1)).as("__n"))
      purch.select(col("event_id"), col("user_id"))
        .join(cnt, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("__n"), lit(0L)).as("n_clicks"))
    }),

    // ---- event-time: weekly cohort retention matrix — users bucketed by
    // first-activity epoch-week, counted per (cohort, weeks-since);
    // all-integer bucket arithmetic, (user, week)-distinct shuffles only
    "e_retention" -> ((s, dir) => {
      import graft.events.EventOps
      EventOps.retention(t(s, dir, "events"), Seq("user_id"), "ts",
        periodUs = 7L * 86400L * 1000000L)
    }),

    // ---- event-time: ordered funnel signup -> click -> purchase, each
    // stage strictly after the previous stage's earliest hit; per-pass
    // conditional min, bounded state (no per-user event lists)
    "e_funnel" -> ((s, dir) => {
      import graft.events.EventOps
      EventOps.funnel(t(s, dir, "events"), Seq("user_id"), "ts",
        "event_type", Seq("signup", "click", "purchase"))
    }),

    // ---- exact per-group quantiles (nearest-rank, all-integer): the
    // exact tier beside colStats' approx_percentile — distinct-value
    // pre-agg shrinks the window input to the value domain, not the rows
    "v_quantiles" -> ((s, dir) =>
      TableChecks.exactQuantiles(t(s, dir, "documents"), col("lang"),
        col("n_chars"),
        Seq(("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)))
        .withColumnRenamed("grp", "lang")),

    // ---- bounded-heap top-k per group (typed Aggregator): map-side
    // combine reduces every partition to k rows per group BEFORE the
    // exchange — the scale-first replacement for row_number()<=k, whose
    // window form sorts and shuffles EVERY row of every group
    "q_topk" -> ((s, dir) => {
      import graft.functions.TopK
      val top5 = udaf(new TopK.TopKAgg(5))
      t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(top5(col("n_chars"), col("doc_id")).as("__t"))
        .select(col("lang"), posexplode(col("__t").getField("items")))
        .select(col("lang"), (col("pos") + 1).as("rank"),
          col("col").getField("id").as("doc_id"),
          col("col").getField("v").as("n_chars"))
    }),

    // ---- data recipe: balance the corpus to its rarest language — the
    // sampling rates are SOLVED from the observed distribution (exact
    // rational n_min/n_lang, integer hash threshold), not configured
    "t_mixture" -> ((s, dir) =>
      TextOps.balanceStrata(t(s, dir, "documents"), "doc_id", "lang")
        .select("doc_id", "lang", "source")),

    // ---- population anomaly scan: every repo's mean content length scored
    // against the population of repos via the modified z-score (median/MAD,
    // Iglewicz-Hoaglin) — flags the generator's drifted repo (4x lengths)
    // with NO reference snapshot, the check a first run over an unknown
    // corpus needs. One full-data agg; the rest is partition-count-sized
    "v_anomaly" -> ((s, dir) =>
      TableChecks.anomalyScan(codeInput(s), col("repo"),
        length(col("content")))),

    // ---- strict vs lax dialect on the SAME column: digits extracted from
    // `source` are a string — lax coerces to int (int_parsing only when no
    // digits), strict rejects the type outright (int_type, mod.rs strict
    // semantics / `Strict` metadata types.py:123)
    "v_strict" -> ((s, dir) => {
      import graft.compile.Compiler
      import org.apache.spark.sql.types.StringType
      val d = t(s, dir, "documents")
      // digit run capped at 17 chars: always inside Long range, so the
      // oracle's CAST can never overflow where the engine try-casts
      val digits = regexp_extract(col("source"), "([0-9]{1,17})", 1)
      val lax = Compiler.compile(digits, StringType, array(lit("n")),
        IntSpec(ge = Some(0)), Mode.Lax)
      val strict = Compiler.compile(digits, StringType, array(lit("n")),
        IntSpec(ge = Some(0)), Mode.Strict)
      d.select(col("doc_id"),
        size(lax.violations).as("lax_nviol"),
        try_element_at(lax.violations, lit(1)).getField("type").as("lax_vtype"),
        try_element_at(strict.violations, lit(1)).getField("type").as("strict_vtype"),
        lax.value.as("lax_value"))
    }),

    // ---- serialization: model_dump_json (by_alias + computed field)
    "z_dump_json" -> ((s, dir) => {
      import graft.serialize.Serializer
      val m = ModelSpec("doc", Seq(
        FieldSpec("doc_id", IntSpec()), FieldSpec("lang", StrSpec()),
        FieldSpec("n_chars", IntSpec())))
      Serializer.dumpJson(t(s, dir, "documents"), m,
        Serializer.DumpSpec(
          byAlias = Map("lang" -> "language"),
          // computed field kept integer-typed: engines format doubles in
          // JSON differently, ints identically
          computed = Seq("n2" -> (col("n_chars") * 2))))
    }),

    // ---- serialization: model_dump projection (include/exclude/alias)
    "z_dump_proj" -> ((s, dir) => {
      import graft.serialize.Serializer
      Serializer.dump(t(s, dir, "documents"), docModel,
        Serializer.DumpSpec(
          include = Some(Seq("doc_id", "lang", "source", "text")),
          exclude = Set("text"),
          byAlias = Map("source" -> "src")))
    }),

    // ---- serialization: nested IncEx include tree (filter.rs /
    // main.py:79) — include={'doc_id': True, 'meta': {'lang': ...,
    // 'n_chars': ...}} projected into the nested struct
    "z_dump_nested" -> ((s, dir) => {
      import graft.serialize.Serializer
      import Serializer.IncEx
      val m = ModelSpec("doc", Seq(
        FieldSpec("doc_id", IntSpec()), FieldSpec("meta", AnySpec)))
      val d = t(s, dir, "documents").select(col("doc_id"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))
      Serializer.dumpJson(d, m, Serializer.DumpSpec(
        includeTree = Map("doc_id" -> IncEx.Leaf,
          "meta" -> IncEx.tree("lang" -> IncEx.Leaf,
            "n_chars" -> IncEx.Leaf))))
    }),

    // ---- serializer: IncEx INTEGER sequence indices (filter.rs int
    // keys): include={'items': {0: True, -1: True}} keeps the first and
    // last element of a 3-element synthesized list
    "z_dump_idx" -> ((s, dir) => {
      import graft.serialize.Serializer
      import Serializer.IncEx
      val m = ModelSpec("doc", Seq(
        FieldSpec("doc_id", IntSpec()), FieldSpec("items", AnySpec)))
      val d = t(s, dir, "documents").select(col("doc_id"),
        array(
          struct(col("doc_id").as("i"), lit("a").as("s")),
          struct((col("doc_id") + 1).as("i"), lit("b").as("s")),
          struct((col("doc_id") + 2).as("i"), lit("c").as("s"))).as("items"))
      // json: positional element selection ({0: True, -1: True});
      // json_sub: per-index SUBTREE projection ({0: {'i'}, -1: {'i'}} —
      // the homogeneous int-key-subtree form, pydantic-golden-pinned in
      // SerializeSpec). Both rendered with dumpJson's exact to_json
      // options (two JSON columns need dumpColumns; dumpJson yields one).
      def j(spec: Serializer.DumpSpec) =
        to_json(struct(Serializer.dumpColumns(m, spec, json = true,
          Some(d.schema)): _*), Map("ignoreNullFields" -> "false"))
      d.select(
        j(Serializer.DumpSpec(
          includeTree = Map("doc_id" -> IncEx.Leaf,
            "items" -> IncEx.tree("0" -> IncEx.Leaf, "-1" -> IncEx.Leaf))))
          .as("json"),
        j(Serializer.DumpSpec(
          includeTree = Map("doc_id" -> IncEx.Leaf,
            "items" -> IncEx.tree(
              "0" -> IncEx.tree("i" -> IncEx.Leaf),
              "-1" -> IncEx.tree("i" -> IncEx.Leaf)))))
          .as("json_sub"))
    }),

    // ---- tagged union: O(1) dispatch on event_type, per-branch model
    // (union.rs:292-352 -> CASE WHEN); unknown tags -> union_tag_invalid
    "q_tagged_union" -> ((s, dir) => {
      import graft.compile.Compiler
      val recType = org.apache.spark.sql.types.DataType.fromDDL(
        "event_type string, value double, k bigint")
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val ev = t(s, dir, "events").select(col("event_id"),
        struct(col("event_type"), col("value"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataType.fromDDL("k BIGINT"))
            .getField("k").as("k")).as("rec"))
      val spec = TaggedUnionSpec("event_type", Seq(
        "purchase" -> ModelSpec("purchase",
          Seq(FieldSpec("value", FloatSpec(ge = Some(10.0))))),
        "click" -> ModelSpec("click",
          Seq(FieldSpec("k", IntSpec(le = Some(50))))),
        "signup" -> ModelSpec("signup", Seq(FieldSpec("value", AnySpec))),
        "error" -> ModelSpec("error", Seq(FieldSpec("value", AnySpec))),
        "view" -> ModelSpec("view", Seq(FieldSpec("value", AnySpec)))))
      val c = Compiler.compile(col("rec"), recType, array(lit("rec")),
        spec, Mode.Lax)
      ev.select(col("event_id"),
        size(c.violations).as("n_viol"),
        try_element_at(c.violations, lit(1)).getField("type").as("vtype"))
    }),

    // ---- extras: Luhn checksum + card brand (PaymentCardNumber,
    // pydantic/types.py:1964) over synthesized PANs
    "x_luhn" -> ((s, dir) => {
      import graft.functions.Extras
      val card = concat(lit("4"), lpad(col("doc_id").cast("string"), 15, "0"))
      t(s, dir, "documents").select(col("doc_id"),
        Extras.luhnValid(card).as("luhn_ok"),
        Extras.cardBrand(card).as("brand"))
    }),

    // ---- extras: validate_email grammar (networks.py:1321 +
    // email-validator v2 subset) — synthesized addresses PLUS the
    // reference's own accept/reject fixture table (name + normalized
    // email pinned per fixture via the oracle)
    // ---- extras: IPvAnyAddress / IPvAnyInterface / IPvAnyNetwork
    // (networks.py:1159-1302) over the transcribed CPython-ipaddress
    // fixture table; errors carry the pydantic error type
    "x_ip" -> ((s, dir) => {
      import graft.functions.IpCanon
      val n = ipFixtures.size
      val fx = element_at(typedLit(ipFixtures.map(_._1)),
        pmod(col("doc_id"), lit(n)).cast("int") + 1)
      // two-projection split: each IpCanon evaluates ONCE; the error
      // columns reference the materialized results (round-3 discipline)
      t(s, dir, "documents").select(col("doc_id"),
          IpCanon.ipAddress(fx).as("ip_addr"),
          IpCanon.ipInterface(fx).as("ip_iface"),
          IpCanon.ipNetwork(fx).as("ip_net"))
        .select(col("doc_id"), col("ip_addr"), col("ip_iface"), col("ip_net"),
          when(col("ip_addr").isNull, "ip_any_address").as("err_addr"),
          when(col("ip_iface").isNull, "ip_any_interface").as("err_iface"),
          when(col("ip_net").isNull, "ip_any_network").as("err_net"))
    }),

    "x_email" -> ((s, dir) => {
      import graft.functions.Extras
      val email = when(pmod(col("doc_id"), lit(10)) === 0,
        concat(col("source"), lit(" bad@x")))
        .otherwise(concat(col("source"), lit("@example.com")))
      val n = emailFixtures.size
      val fx = element_at(typedLit(emailFixtures.map(_._1)),
        pmod(col("doc_id"), lit(n)).cast("int") + 1)
      val parsed = Extras.parseNameEmail(fx)
      t(s, dir, "documents").select(col("doc_id"),
        Extras.isEmail(email).as("email_ok"),
        parsed.isNotNull.as("fix_ok"),
        parsed.getField("name").as("fix_name"),
        parsed.getField("email").as("fix_email"))
    }),

    // ---- extras: Color type (pydantic/color.py) — named / short hex /
    // long hex / rgb / rgba-with-percent-alpha / invalid, canonicalized
    // to as_hex + as_rgb
    "x_color" -> ((s, dir) => {
      import graft.functions.ColorOps
      val m = pmod(col("doc_id"), lit(6)).cast("int")
      val h = md5(col("doc_id").cast("string"))
      val cr = pmod(col("doc_id"), lit(256)).cast("int")
      val cg = pmod(col("doc_id") * 7, lit(256)).cast("int")
      val cb = pmod(col("doc_id") * 13, lit(256)).cast("int")
      val input = when(m === 0, concat(lit("#"), substring(h, 1, 6)))
        .when(m === 1, concat(lit("0x"), substring(h, 1, 3)))
        .when(m === 2, concat(lit("rgb("), cr.cast("string"), lit(", "),
          cg.cast("string"), lit(", "), cb.cast("string"), lit(")")))
        .when(m === 3, element_at(
          typedLit(Seq("navy", "red", "aliceblue", "gold")),
          pmod(col("doc_id"), lit(4)).cast("int") + 1))
        .when(m === 4, concat(lit("rgba("), cr.cast("string"), lit(", "),
          cg.cast("string"), lit(", "), cb.cast("string"), lit(", 25%)")))
        .otherwise(lit("not-a-color"))
      // Parse via the per-format split (ColorOps.withParsedColor). NOTE:
      // this stage intentionally tolerates whole-stage-codegen fallback —
      // struct-producing projections inline into one generated method and
      // six regex-gated format parsers exceed Janino's 64KB per-method
      // limit; Spark then runs the stage with per-expression codegen,
      // which is the right tier for a parse this wide. All numeric casts
      // are ''-null-safe so a SUCCESSFUL whole-stage compile (where CSE
      // hoists shared casts above their CaseWhen guards) stays correct.
      ColorOps.withParsedColor(
          t(s, dir, "documents").select(col("doc_id"), input.as("__c")),
          "__c", "__p")
        .select(col("doc_id"),
          col("__p").isNotNull.as("is_color"),
          ColorOps.colorAsHex(col("__p")).as("hex"),
          ColorOps.colorAsRgb(col("__p")).as("rgb"))
    }),

    // ---- extras: ByteSize parse (pydantic/types.py:2070)
    "x_bytesize" -> ((s, dir) => {
      import graft.functions.Extras
      val unit = element_at(typedLit(Seq("B", "KiB", "MB", "GiB")),
        pmod(col("doc_id"), lit(4)).cast("int") + 1)
      val sz = concat(col("n_chars").cast("string"), lit(" "), unit)
      t(s, dir, "documents").select(col("doc_id"),
        Extras.parseByteSize(sz).as("bytes"))
    }),

    // ---- uniqueness, salted two-phase flavor (skew path): must agree
    // with the plain groupBy — same oracle as v_unique_dups
    "v_unique_salted" -> ((s, dir) => {
      TableChecks.duplicateKeysSalted(t(s, dir, "documents"),
        Seq("lang", "source"), saltBuckets = 16)
    }),

    // ---- checkpointed runner end-to-end (rows-only driver check: no
    // ANSI-SQL analog for ledger/resume semantics). Fresh state dir per
    // invocation; returns the committed per-partition verdict rows.
    "r_runner" -> ((s, dir) => {
      val out = java.nio.file.Files
        .createTempDirectory("graft-verify-runner").toString
      val docs = t(s, dir, "documents")
        .withColumn("content", col("text"))
      graft.run.Runner.run(s, docs, docModel, keyCol = "source",
        contentCol = "content", outDir = out, buckets = 8, waveSize = 4,
        histLo = 0, histHi = 600, histBuckets = 20)
      graft.run.Runner.results(s, out)
        .select(col("part_id").cast("long").as("part_id"), col("row_count"),
          col("violation_count"), col("invalid_rows"), col("passed"))
    }),

    // ---- multimodal plumbing (rows-only): synthetic media -> batch
    // feature extraction -> per-kind aggregate
    "m_media_stats" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.extractFeatures(Multimodal.synthetic(s, 600L)).toDF()
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum(col("byte_size")).as("total_bytes"),
          count(when(col("frame_count") > 0, 1)).as("with_frames"))
    }),

    // ---- multimodal: REAL image-header decode — synthesize valid
    // PNG/JPEG/GIF header bytes from doc_id, parse dimensions back with
    // the codegen'd header expressions (MediaHeaders); the oracle
    // recomputes (format, width, height) from the same arithmetic, so a
    // single wrong offset anywhere in the byte round-trip breaks the hash
    "m_image_dims" -> ((s, dir) => {
      import graft.multimodal.MediaHeaders
      val w = (pmod(col("doc_id"), lit(1000)) + 1).cast("int")
      val h = (pmod(col("doc_id"), lit(700)) + 1).cast("int")
      def be32(c: Column) = lpad(hex(c), 8, "0")
      def be16(c: Column) = lpad(hex(c), 4, "0")
      def le16(c: Column) = concat(
        lpad(hex(pmod(c, lit(256))), 2, "0"),
        lpad(hex((c / 256).cast("int")), 2, "0"))
      val m = pmod(col("doc_id"), lit(3)).cast("int")
      val pngHex = concat(lit("89504E470D0A1A0A0000000D49484452"),
        be32(w), be32(h), lit("0806000000"))
      val jpegHex = concat(lit("FFD8FFE000040000FFC0001108"),
        be16(h), be16(w), lit("03011100021101031101"))
      val gifHex = concat(lit("474946383961"), le16(w), le16(h), lit("00"))
      val payload = unhex(when(m === 0, pngHex)
        .when(m === 1, jpegHex).otherwise(gifHex))
      t(s, dir, "documents")
        .select(col("doc_id"), payload.as("__img"))
        .select(col("doc_id"),
          MediaHeaders.imageDims(col("__img")).as("d"))
        .select(col("doc_id"), col("d.format").as("fmt"),
          col("d.width").as("width"), col("d.height").as("height"))
    }),

    // ---- multimodal: dims-fallback formats — BMP/PPM/TIFF/ICO payloads
    // synthesized from doc_id arithmetic and parsed back through the FULL
    // extractFeatures chain (MediaHeaders miss -> MediaExtra.parseMoreDims),
    // so the oracle pins the fallback WIRING end-to-end, not just the
    // parsers the unit spec covers
    "m_dims_extra" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def be16(c: Column) = lpad(hex(c), 4, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val m = pmod(col("doc_id"), lit(4)).cast("int")
      val wB = (pmod(col("doc_id"), lit(1000)) + 1).cast("int") // bmp/tiff
      val hB = (pmod(col("doc_id"), lit(700)) + 1).cast("int")
      val wP = (pmod(col("doc_id"), lit(13)) + 1).cast("int")   // ppm
      val hP = (pmod(col("doc_id"), lit(7)) + 1).cast("int")
      val wI = (pmod(col("doc_id"), lit(255)) + 1).cast("int")  // ico
      val hI = (pmod(col("doc_id"), lit(100)) + 1).cast("int")
      // BMP: the 26 fixed header bytes are exactly what the parser reads
      val bmpHex = concat(lit("424D"), le32h(lit(26)), lit("00000000"),
        le32h(lit(26)), le32h(lit(40)), le32h(wB), le32h(hB))
      // PPM P6 must carry its full raster: PpmInfo.scan validates length
      val ppmHdr = concat(lit("P6\n"), wP.cast("string"), lit(" "),
        hP.cast("string"), lit("\n255\n"))
      val ppmBin = concat(ppmHdr.cast("binary"),
        unhex(rep(lit("010203"), wP * hP)))
      // TIFF big-endian: one IFD, ImageWidth/ImageLength SHORT entries
      val tiffHex = concat(lit("4D4D002A000000080002"),
        lit("0100000300000001"), be16(wB), lit("0000"),
        lit("0101000300000001"), be16(hB), lit("0000"),
        lit("00000000"))
      // ICO: 6-byte directory + one 16-byte entry; dims are bytes 6/7
      val icoHex = concat(lit("000001000100"), h2(wI), h2(hI),
        lit("00" * 14))
      val payload = when(m === 0, unhex(bmpHex))
        .when(m === 1, ppmBin)
        .when(m === 2, unhex(tiffHex))
        .otherwise(unhex(icoHex))
      val rows = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("kind"),
          payload.as("payload"),
          typedLit(Map.empty[String, String]).as("meta"))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(rows).toDF()
        .select(col("media_id").as("doc_id"),
          element_at(
            array(lit("bmp"), lit("ppm"), lit("tiff"), lit("ico")),
            (pmod(col("media_id"), lit(4)) + 1).cast("int")).as("fmt"),
          col("width"), col("height"))
    }),

    // ---- multimodal: REAL content embeddings end-to-end — two-tone PPM
    // rasters (image arm) and stereo square-wave WAVs (audio arm) routed
    // through the FULL extractFeatures path; the 8-dim color-moment /
    // waveform-statistics descriptors (ContentEmbed) use only
    // correctly-rounded IEEE double ops (+,-,*,/,sqrt) with one final
    // float32 rounding, so DuckDB replays every component BIT-EXACTLY
    // from the synthesis arithmetic — a float oracle with no tolerance
    "m_embed" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val even = pmod(col("doc_id"), lit(2)) === 0
      // image arm: two-tone binary PPM — q pixels of color A, n-q of B
      val w = (pmod(col("doc_id"), lit(9)) + 2).cast("int")
      val h = (pmod(col("doc_id"), lit(5)) + 1).cast("int")
      val n = w * h
      val q = (pmod(col("doc_id"), (n - 1).cast("long")) + 1).cast("int")
      val rgbA = concat(h2(pmod(col("doc_id") * 11, lit(256))),
        h2(pmod(col("doc_id") * 5, lit(256))),
        h2(pmod(col("doc_id") * 3, lit(256))))
      val rgbB = concat(h2(pmod(col("doc_id") * 7, lit(256))),
        h2(pmod(col("doc_id") * 13, lit(256))),
        h2(pmod(col("doc_id") * 17, lit(256))))
      val ppmHdr = concat(lit("P6\n"), w.cast("string"), lit(" "),
        h.cast("string"), lit("\n255\n"))
      val ppm = concat(encode(ppmHdr, "UTF-8"),
        unhex(concat(rep(rgbA, q), rep(rgbB, n - q))))
      // audio arm: the m_audio_pcm square-wave shape, stereo
      val ch = lit(2)
      val amp = when(pmod(col("doc_id"), lit(11)) === 0, lit(32767))
        .otherwise(pmod(col("doc_id") * 37, lit(32767)).cast("int"))
      val half = (pmod(col("doc_id"), lit(50)) + 1).cast("int")
      val nFrames = half * 2
      val ds = nFrames * ch * 2
      val sr = (lit(8000) + pmod(col("doc_id"), lit(8)).cast("int") * 4000)
        .cast("int")
      val neg = pmod(lit(65536) - amp, lit(65536))
      val pair = concat(rep(le16h(amp), ch), rep(le16h(neg), ch))
      val wavHex = concat(
        lit("52494646"), le32h(ds + 36), lit("57415645"),
        lit("666D7420"), lit("10000000"), lit("0100"), le16h(ch),
        le32h(sr), le32h(sr * ch * 2), le16h(ch * 2), lit("1000"),
        lit("64617461"), le32h(ds), rep(pair, half))
      val payload = when(even, ppm).otherwise(unhex(wavHex))
      val rows = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          when(even, "image").otherwise("audio").as("kind"),
          payload.as("payload"),
          typedLit(Map.empty[String, String]).as("meta"))
        .as[Multimodal.MediaRow]
      val emb = (0 until 8).map(i =>
        element_at(col("embedding"), i + 1).as(s"e$i"))
      Multimodal.extractFeatures(rows).toDF()
        .select(col("media_id").as("doc_id") +: col("kind").as("modality")
          +: emb: _*)
    }),

    // ---- multimodal: content-based near-duplicate detection — the image
    // dedup a 100-TB multimodal ingest runs. Paired two-tone PPMs (docs
    // 2p and 2p+1 share geometry and colors except ONE blue-channel unit
    // in color B) are REALLY decoded, embedded by the color-moment
    // descriptor (ContentEmbed via the full extractFeatures path), and
    // fed to the LSH-bucketed embedding near-dup operator: corpus-scaled
    // portable planes -> same-bucket equi-join (never |corpus|^2), bucket
    // cap, one in-order dot per surviving candidate. The oracle replays
    // the whole chain in DuckDB: closed-form moments -> float32 embedding
    // components -> md5 planes -> buckets -> normalized in-order dots —
    // bit-exact doubles, so even threshold-straddling pairs agree
    "m_near_dup" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val p = expr("doc_id div 2")
      val o = pmod(col("doc_id"), lit(2))
      val w = (pmod(p, lit(9)) + 2).cast("int")
      val h = (pmod(p, lit(5)) + 1).cast("int")
      val n = w * h
      val q = (pmod(p, (n - 1).cast("long")) + 1).cast("int")
      val rgbA = concat(h2(pmod(p * 11, lit(256))),
        h2(pmod(p * 5, lit(256))), h2(pmod(p * 3, lit(256))))
      val rgbB = concat(h2(pmod(p * 7, lit(256))),
        h2(pmod(p * 13, lit(256))), h2(pmod(p * 17 + o, lit(256))))
      val ppmHdr = concat(lit("P6\n"), w.cast("string"), lit(" "),
        h.cast("string"), lit("\n255\n"))
      val ppm = concat(encode(ppmHdr, "UTF-8"),
        unhex(concat(rep(rgbA, q), rep(rgbB, n - q))))
      val rows = t(s, dir, "documents")
        .select(col("doc_id").as("media_id"), lit("image").as("kind"),
          ppm.as("payload"),
          typedLit(Map.empty[String, String]).as("meta"))
        .as[Multimodal.MediaRow]
      val embDf = Multimodal.extractFeatures(rows).toDF()
        .select(col("media_id").as("vec_id"), col("embedding"))
      // plane count from the parquet row-count metadata (NOT a second
      // pass over the decoded embeddings)
      val planes = Similarity.portablePlanes(
        Similarity.planesForCount(t(s, dir, "documents").count(),
          ndTargetLoad), 8)
      Similarity.nearDupPairs(embDf, "vec_id", "embedding",
        threshold = 0.995, planes, maxBucket = simMaxBucket)
    }),

    // ---- multimodal: REAL pixel decode — synthesized uncompressed
    // 24-bit BMPs (bottom-up BGR rows, live 4-byte padding the walker
    // must skip), binary PPM P6 rasters (with a header comment), and
    // true PNGs (zlib stream with a stored-deflate block; the decoder
    // inflates with the JDK Inflater and unfilters scanlines — the
    // compressed-deflate + filter-1..4 paths are pinned by MediaPixelSpec
    // against real Deflater output). Solid per-doc colors so the DuckDB
    // oracle replays exact channel sums from arithmetic; channel sums
    // are longs (means = rationals downstream).
    "m_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      val w = (pmod(col("doc_id"), lit(13)) + 1).cast("int")
      val h = (pmod(col("doc_id"), lit(7)) + 1).cast("int")
      val r = pmod(col("doc_id") * 13, lit(256)).cast("int")
      val g = pmod(col("doc_id") * 7, lit(256)).cast("int")
      val b = pmod(col("doc_id"), lit(256)).cast("int")
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      // SQL repeat with a COLUMN count: one expression node, vs the
      // concat(Seq.fill(max)(unit)).substr form whose duplicated unit
      // trees pushed the synthesis projection past Janino's 64KB method
      // limit (codegen fallback to interpreted eval)
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      // BMP: BGR pixel, rows padded to 4 bytes with 0xFF sentinels (a
      // walker that reads padding would corrupt max/sums immediately)
      val bgr = concat(h2(b), h2(g), h2(r))
      val padB = pmod(lit(4) - pmod(w * 3, lit(4)), lit(4))
      val bmpRow = concat(rep(bgr, w), rep(lit("FF"), padB))
      val stride = w * 3 + padB
      val bmpHex = concat(lit("424D"), le32h(lit(54) + stride * h),
        lit("00000000"), le32h(lit(54)), le32h(lit(40)),
        le32h(w), le32h(h), lit("0100"), lit("1800"), le32h(lit(0)),
        le32h(stride * h), le32h(lit(2835)), le32h(lit(2835)),
        le32h(lit(0)), le32h(lit(0)),
        rep(bmpRow, h))
      // PPM P6: ascii header with a '#' comment line, RGB raster
      val ppmHdr = concat(lit("P6\n# c"), col("doc_id").cast("string"),
        lit("\n"), w.cast("string"), lit(" "), h.cast("string"),
        lit("\n255\n"))
      val rgb = concat(h2(r), h2(g), h2(b))
      val ppm = concat(encode(ppmHdr, "UTF-8"),
        unhex(rep(rgb, w * h)))
      // PNG: stored-deflate zlib (BFINAL=1 BTYPE=00 block), filter byte 0
      // per scanline. The decoder inflates RAW past the zlib header and
      // never reads the Adler-32 / chunk CRCs, so those trail as zeros
      // (IEND's constant CRC is the real one).
      def be32h(c: Column) = lpad(hex(c), 8, "0")
      val pngN = h * (w * 3 + 1) // filter byte + RGB row, h rows
      val pngRow = concat(lit("00"), rep(rgb, w))
      val pngZlib = concat(lit("780101"), le16h(pngN),
        le16h(lit(65535) - pngN), rep(pngRow, h), lit("00000000"))
      val pngHex = concat(lit("89504E470D0A1A0A"),
        lit("0000000D49484452"), be32h(w), be32h(h), lit("0802000000"),
        lit("00000000"),
        be32h(pngN + 11), lit("49444154"), pngZlib, lit("00000000"),
        lit("0000000049454E44AE426082"))
      // GIF: 128-entry global color table (every entry the doc color, so
      // any index is the solid color), minCodeSize=7 -> 8-bit codes, and
      // a CLEAR code (0x80) before every literal so the LZW dictionary
      // never grows: the code stream is byte-aligned and synthesizable as
      // repeat("80" + index). The decoder runs its REAL variable-width
      // LZW; compressed multi-code streams are pinned by MediaPixelSpec's
      // greedy-encoder round-trip.
      val gifIdx = h2(pmod(col("doc_id"), lit(128)))
      val gifN = w * h
      val gifHex = concat(lit("474946383961"), le16h(w), le16h(h),
        lit("F60000"), rep(rgb, lit(128)),
        lit("2C"), lit("00000000"), le16h(w), le16h(h), lit("00"),
        lit("07"), h2(gifN * 2 + 1), rep(concat(lit("80"), gifIdx), gifN),
        lit("81"), lit("00"), lit("3B"))
      // JPEG: REAL baseline decode (Huffman + dequant + IDCT). Grayscale,
      // dims multiples of 8, custom DHT pair sized so the entropy stream
      // is byte-aligned per MCU: first MCU = DC cat-7 code (4 bits) +
      // 7 value bits + EOB (5 bits) = 2 bytes; every later MCU = DC
      // cat-0 (3 bits) + EOB (5 bits) = one 0x00 byte, synthesizable as
      // repeat. Q(0)=8 makes the DC-only IDCT exact by T.81 arithmetic
      // (pixel = 128 + dc), so DuckDB replays the gray level exactly:
      // 192..255 for even docs (positive DC diff), 1..64 for odd
      // (negative, coded as d+127 in 7 bits). Compressed multi-
      // coefficient streams are pinned by MediaPixelSpec against the
      // JDK ImageIO codec.
      def jbe16(c: Column) = lpad(hex(c), 4, "0")
      val jw = (pmod(col("doc_id"), lit(4)) + 1).cast("int") * 8
      val jh = (pmod(col("doc_id"), lit(3)) + 1).cast("int") * 8
      val jd = pmod(col("doc_id"), lit(64)).cast("int") + 64
      val vbits = when(pmod(col("doc_id"), lit(2)) === 0, jd)
        .otherwise(lit(127) - jd)
      val jpegHexFull = concat(
        lit("FFD8"),
        lit("FFDB004300"), rep(lit("08"), lit(64)),            // DQT, Q=8
        lit("FFC0000B08"), jbe16(jh), jbe16(jw), lit("01011100"), // SOF0
        lit("FFC4001500"),                                     // DHT DC
        lit("00000101000000000000000000000000"), lit("0007"),  // len3->0, len4->7
        lit("FFC4001410"),                                     // DHT AC
        lit("00000000010000000000000000000000"), lit("00"),    // len5->EOB
        lit("FFDA0008010100003F00"),                           // SOS
        h2(lit(32) + (vbits / 8).cast("int")),                 // 0010 + v6..v3
        h2(pmod(vbits, lit(8)) * 32),                          // v2..v0 + EOB
        rep(lit("00"), (jw / 8) * (jh / 8) - 1),               // flat MCUs
        lit("FFD9"))
      val m5 = pmod(col("doc_id"), lit(5)).cast("int")
      val payload = when(m5 === 0, unhex(bmpHex))
        .when(m5 === 1, ppm).when(m5 === 2, unhex(pngHex))
        .when(m5 === 3, unhex(gifHex))
        .otherwise(unhex(jpegHexFull))
      // three projections, each alias referenced 2+ times downstream, so
      // CollapseProject keeps them apart (q_complex discipline): the
      // payload synthesis and each raster walk run ONCE per row — the
      // single-Column packed form re-evaluated the walk per stat field
      // (15s for 500 rows vs sub-second staged)
      def px(i: Int) = coalesce(
        element_at(col("__bmp"), i), element_at(col("__ppm"), i),
        element_at(col("__png"), i), element_at(col("__gif"), i),
        element_at(col("__jpg"), i))
      t(s, dir, "documents")
        .select(col("doc_id"), payload.as("__pl"))
        .select(col("doc_id"),
          MediaExtra.bmpScan(col("__pl")).as("__bmp"),
          MediaExtra.ppmScan(col("__pl")).as("__ppm"),
          MediaExtra.pngScan(col("__pl")).as("__png"),
          MediaExtra.gifScan(col("__pl")).as("__gif"),
          MediaExtra.jpegScan(col("__pl")).as("__jpg"))
        .select(col("doc_id"),
          when(col("__bmp").isNotNull, "bmp")
            .when(col("__ppm").isNotNull, "ppm")
            .when(col("__png").isNotNull, "png")
            .when(col("__gif").isNotNull, "gif")
            .when(col("__jpg").isNotNull, "jpeg").as("fmt"),
          px(1).cast("int").as("width"), px(2).cast("int").as("height"),
          px(3).as("sum_r"), px(4).as("sum_g"), px(5).as("sum_b"),
          px(6).as("n_px"), px(7).cast("int").as("min_ch"),
          px(8).cast("int").as("max_ch"),
          // second-moment slots (exact longs) — the color-moment content
          // embedding's inputs, pinned across all five real decoders
          px(9).as("sq_r"), px(10).as("sq_g"), px(11).as("sq_b"))
    }),

    // ---- multimodal: container/tag metadata — TIFF IFD dims (both byte
    // orders), ICO directory dims (0-means-256 case live), ID3v2.3/v2.4
    // TIT2/TPE1 text frames WITH a trailing ID3v1 block (both parsed),
    // OGG Opus + Vorbis identification headers. All synthesized per doc,
    // all replayed by the oracle from arithmetic.
    "m_container_meta" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      val m = pmod(col("doc_id"), lit(5)).cast("int")
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def be16h(c: Column) = lpad(hex(c), 4, "0")
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def asciiHex(c: Column) = hex(c) // ascii strings only
      val w = (pmod(col("doc_id"), lit(500)) + 1).cast("int")
      val ht = (pmod(col("doc_id"), lit(300)) + 1).cast("int")
      // TIFF: alternate byte order by doc parity; SHORT-typed dims
      val tiffLe = concat(lit("49492A00"), le32h(lit(8)), lit("0200"),
        lit("00010300"), le32h(lit(1)), le16h(w), lit("0000"),
        lit("01010300"), le32h(lit(1)), le16h(ht), lit("0000"),
        le32h(lit(0)))
      val tiffBe = concat(lit("4D4D002A"), lit("00000008"), lit("0002"),
        lit("01000003"), lit("00000001"), be16h(w), lit("0000"),
        lit("01010003"), lit("00000001"), be16h(ht), lit("0000"),
        lit("00000000"))
      val tiff = when(pmod(col("doc_id"), lit(2)) === 0, tiffLe)
        .otherwise(tiffBe)
      // ICO: first directory entry; width/height bytes, 0 == 256
      val wb = pmod(col("doc_id"), lit(256)).cast("int")
      val hb = pmod(col("doc_id") * 3, lit(256)).cast("int")
      val ico = concat(lit("00000100"), le16h(lit(1)), h2(wb), h2(hb),
        lit("0000"), le16h(lit(1)), le16h(lit(32)), le32h(lit(64)),
        le32h(lit(22)))
      // ID3v2 (v2.3 even docs, v2.4 odd — sizes < 128 so syncsafe and
      // plain u32 bytes coincide while exercising both parse paths),
      // plus a trailing ID3v1 block with its own title/artist
      val title = concat(lit("t"), col("doc_id").cast("string"))
      val artist = concat(lit("a"), col("doc_id").cast("string"))
      val tit2 = concat(lit("54495432"), le32h(lit(0)).substr(1, 6),
        h2(length(title) + 1), lit("0000"), lit("00"), asciiHex(title))
      val tpe1 = concat(lit("54504531"), le32h(lit(0)).substr(1, 6),
        h2(length(artist) + 1), lit("0000"), lit("00"), asciiHex(artist))
      val tagSz = length(title) + length(artist) + lit(22)
      val vmaj = when(pmod(col("doc_id"), lit(2)) === 0, lit(3))
        .otherwise(lit(4))
      val id3v1 = concat(lit("544147"),
        asciiHex(rpad(concat(lit("v1t"), col("doc_id").cast("string")),
          30, " ")),
        asciiHex(rpad(concat(lit("v1a"), col("doc_id").cast("string")),
          30, " ")),
        asciiHex(rpad(lit(""), 30, " ")), asciiHex(lit("2026")),
        asciiHex(rpad(lit(""), 30, " ")), lit("FF"))
      val id3 = concat(lit("494433"), h2(vmaj), lit("0000"),
        le32h(lit(0)).substr(1, 6), h2(tagSz), tit2, tpe1, id3v1)
      // OGG: one BOS page; Opus (19-byte OpusHead) / Vorbis (30-byte id)
      val ch = (pmod(col("doc_id"), lit(8)) + 1).cast("int")
      val rate = element_at(typedLit(Seq(8000, 16000, 44100, 48000)),
        pmod(col("doc_id"), lit(4)).cast("int") + 1)
      val oggPre = concat(lit("4F676753"), lit("0002"),
        lit("0000000000000000"), le32h(pmod(col("doc_id"), lit(65536))),
        le32h(lit(0)), le32h(lit(0)), lit("01"))
      // closing EOS page whose granule position encodes the stream
      // length: Vorbis granules are PCM samples at the stream rate,
      // Opus granules 48kHz samples offset by the 312-sample pre-skip —
      // both synthesized so duration_ms = 10 * k exactly (rates are all
      // divisible by 100, so the closed form survives integer division)
      val oggK = (pmod(col("doc_id"), lit(1000)) + 1).cast("int")
      def le64h(c: Column) = concat(le32h(c), lit("00000000"))
      def eosPage(gp: Column) = concat(lit("4F676753"), lit("0004"),
        le64h(gp), le32h(pmod(col("doc_id"), lit(65536))),
        le32h(lit(1)), le32h(lit(0)), lit("01"), lit("01"), lit("00"))
      val opus = concat(oggPre, lit("13"), lit("4F70757348656164"),
        lit("01"), h2(ch), le16h(lit(312)), le32h(rate), lit("0000"),
        lit("00"), eosPage(oggK * 480 + 312))
      val vorbis = concat(oggPre, lit("1E"), lit("01"),
        lit("766F72626973"), le32h(lit(0)), h2(ch), le32h(rate),
        le32h(lit(0)), le32h(lit(0)), le32h(lit(0)), lit("00"), lit("01"),
        eosPage((rate / 100).cast("int") * oggK))
      val payload = unhex(when(m === 0, tiff).when(m === 1, ico)
        .when(m === 2, id3).when(m === 3, opus).otherwise(vorbis))
      // staged like m_pixel_stats: payload synthesis once, each header
      // scan once, then a cheap unpack projection
      t(s, dir, "documents")
        .select(col("doc_id"), m.as("__m"), payload.as("__pl"))
        .select(col("doc_id"), col("__m"),
          MediaExtra.tiffScan(col("__pl")).as("__td"),
          MediaExtra.icoDims(col("__pl")).as("__ic"),
          MediaExtra.id3v2Scan(col("__pl")).as("__i2"),
          MediaExtra.id3v1Tags(col("__pl")).as("__i1"),
          MediaExtra.oggScan(col("__pl")).as("__og"),
          MediaExtra.oggDurationScan(col("__pl")).as("__od"))
        .select(col("doc_id"),
          when(col("__m") === 0, "tiff").when(col("__m") === 1, "ico")
            .when(col("__m") === 2, "id3").otherwise("ogg").as("kind"),
          coalesce(element_at(col("__td"), 1).cast("int"),
            col("__ic.width")).as("width"),
          coalesce(element_at(col("__td"), 2).cast("int"),
            col("__ic.height")).as("height"),
          element_at(col("__i2"), 1).as("id3_version"),
          element_at(col("__i2"), 2).as("title"),
          element_at(col("__i2"), 3).as("artist"),
          col("__i1.title").as("v1_title"),
          when(element_at(col("__og"), 1) === 0L, "opus")
            .when(element_at(col("__og"), 1).isNotNull, "vorbis")
            .as("codec"),
          element_at(col("__og"), 2).cast("int").as("channels"),
          element_at(col("__og"), 3).cast("int").as("sample_rate"),
          element_at(col("__od"), 4).as("duration_ms"))
    }),

    // ---- complex numbers (validators/complex.rs -> Python complex()
    // grammar): six synthesized literal forms incl. parens, pure-j,
    // exponents and a reject; value + str(complex)-style rendering
    "q_complex" -> ((s, dir) => {
      import graft.compile.Compiler
      import graft.serialize.Serializer
      import org.apache.spark.sql.types.StringType
      val a = pmod(col("doc_id"), lit(100)).cast("long")
      val b = pmod(col("doc_id"), lit(7)).cast("long")
      val c50 = pmod(col("doc_id"), lit(50)).cast("long")
      val b9 = pmod(col("doc_id"), lit(9)).cast("long")
      val b30 = pmod(col("doc_id"), lit(30)).cast("long")
      val m = pmod(col("doc_id"), lit(6)).cast("int")
      val input = when(m === 0,
          concat(a.cast("string"), lit("+"), b.cast("string"), lit("j")))
        .when(m === 1, concat(lit("("), c50.cast("string"), lit("-"),
          b9.cast("string"), lit(".5j)")))
        .when(m === 2, concat(b30.cast("string"), lit("j")))
        .when(m === 3, lit("j"))
        .when(m === 4, concat(a.cast("string"), lit("."),
          b.cast("string"), lit("e2")))
        .otherwise(lit("bad"))
      val cc = Compiler.compile(input, StringType, array(lit("z")),
        ComplexSpec, Mode.Lax)
      // materialize the parse ONCE: the outer projection references the
      // struct 4+ ways (and complexJson ~15 more inside cxPart), so an
      // inlined tree re-evaluates the grammar regexes ~30x — measured
      // 29s -> sub-second with the projection boundary (CollapseProject
      // keeps it: merging would duplicate a non-cheap expression)
      t(s, dir, "documents")
        .select(col("doc_id"), cc.value.as("__cx"),
          size(cc.violations).as("__nv"))
        .select(col("doc_id"), (col("__nv") === 0).as("ok"),
          col("__cx.re").as("re"), col("__cx.im").as("im"),
          Serializer.complexJson(col("__cx")).as("cjson"))
    }),

    // ---- exact rationals (validators/fraction.rs -> fractions.Fraction):
    // n/d, decimal, negative-int, exponent and reject forms; reduced
    // num/den + str(Fraction) rendering (DuckDB replays with gcd())
    "q_fraction" -> ((s, dir) => {
      import graft.compile.Compiler
      import graft.serialize.Serializer
      import org.apache.spark.sql.types.StringType
      val a = (pmod(col("doc_id"), lit(97)) + 1).cast("long")
      val b = (pmod(col("doc_id"), lit(13)) + 1).cast("long")
      val d1 = pmod(col("doc_id"), lit(10)).cast("long")
      val m = pmod(col("doc_id"), lit(5)).cast("int")
      val input = when(m === 0,
          concat(a.cast("string"), lit("/"), b.cast("string")))
        .when(m === 1, concat(a.cast("string"), lit("."), d1.cast("string")))
        .when(m === 2, concat(lit("-"), a.cast("string")))
        .when(m === 3, concat(a.cast("string"), lit("e-2")))
        .otherwise(when(pmod(col("doc_id"), lit(2)) === 0, lit("x"))
          .otherwise(lit("3/0")))
      val cf = Compiler.compile(input, StringType, array(lit("z")),
        FractionSpec(), Mode.Lax)
      // same two-projection split as q_complex (the fraction parse tree
      // is referenced 5 ways downstream)
      t(s, dir, "documents")
        .select(col("doc_id"), cf.value.as("__fr"),
          try_element_at(cf.violations, lit(1)).getField("type").as("vtype"))
        .select(col("doc_id"), col("__fr.num").as("num"),
          col("__fr.den").as("den"), col("vtype"),
          Serializer.fractionJson(col("__fr")).as("fjson"))
    }),

    // ---- multimodal: REAL MP4 decode — ftyp + moov{mvhd, trak>mdia>
    // {hdlr'vide', minf>stbl>stts}} boxes synthesized from doc_id, walked
    // back by the native box-scan expression; duration_ms = duration *
    // 1000 / timescale, n_frames = the stts sample-count sum (2 entries)
    "m_mp4_info" -> ((s, dir) => {
      import graft.multimodal.MediaHeaders
      val ts = ((pmod(col("doc_id"), lit(3)) + 1) * 600).cast("int")
      val dur = (pmod(col("doc_id"), lit(9000)) + 1000).cast("int")
      val c1 = (pmod(col("doc_id"), lit(100)) + 10).cast("int")
      val c2 = (pmod(col("doc_id"), lit(50)) + 5).cast("int")
      def be32(c: Column) = lpad(hex(c), 8, "0")
      val hdr = concat(
        lit("0000001066747970" + "69736F6D00000000"), // ftyp isom
        lit("000000786D6F6F76"),                       // moov, size 120
        lit("0000001C6D766864" + "00000000" + "00000000" + "00000000"),
        be32(ts), be32(dur),                           // mvhd v0 ts+dur
        lit("000000547472616B" + "0000004C6D646961"),  // trak > mdia
        lit("0000001468646C72" + "00000000" + "00000000" + "76696465"),
        lit("000000306D696E66" + "000000287374626C"),  // minf > stbl
        lit("0000002073747473" + "00000000" + "00000002"), // stts v0, 2 ent
        be32(c1), lit("00000064"), be32(c2), lit("000000C8"))
      t(s, dir, "documents")
        .select(col("doc_id"), MediaHeaders.mp4Info(unhex(hdr)).as("m"))
        .select(col("doc_id"), col("m.timescale"), col("m.duration"),
          col("m.duration_ms"), col("m.n_frames"))
    }),

    // ---- multimodal: REAL FLAC STREAMINFO decode — fLaC magic + packed
    // rate/channels/bps/total-samples bits synthesized from doc_id,
    // unpacked by the native block scan
    "m_flac_info" -> ((s, dir) => {
      import graft.multimodal.MediaHeaders
      val rate = (lit(8000) +
        pmod(col("doc_id"), lit(8)).cast("int") * 4000).cast("long")
      val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("long")
      val total = ((pmod(col("doc_id"), lit(1000)) + 1) * 4096).cast("long")
      // packed 8 bytes: rate(20) | ch-1(3) | bps-1=15(5) | total(36)
      val packed = shiftleft(rate, 44) + shiftleft(ch - 1, 41) +
        shiftleft(lit(15L), 36) + total
      val hdr = concat(
        lit("664C6143" + "80000022" + "10001000" + "000000" + "000000"),
        lpad(hex(packed), 16, "0"), lit("0" * 32))
      t(s, dir, "documents")
        .select(col("doc_id"), MediaHeaders.flacInfo(unhex(hdr)).as("m"))
        .select(col("doc_id"), col("m.sample_rate"), col("m.channels"),
          col("m.bits_per_sample"), col("m.total_samples"),
          col("m.duration_ms"))
    }),

    // ---- multimodal: REAL MP3 frame-header decode — MPEG1 Layer III
    // header + variable zero padding synthesized from doc_id; CBR
    // duration estimate = payload bytes * 8 / bitrate
    "m_mp3_info" -> ((s, dir) => {
      import graft.multimodal.MediaHeaders
      val brIdx = (pmod(col("doc_id"), lit(14)) + 1).cast("long")
      val srIdx = pmod(col("doc_id"), lit(3)).cast("long")
      val b3 = lpad(hex(shiftleft(brIdx, 4) + shiftleft(srIdx, 2)), 2, "0")
      val n = (pmod(col("doc_id"), lit(512))).cast("int")
      // even docs: CBR (duration from payload bytes at the header
      // bitrate); odd docs: a REAL Xing VBR tag — mono MPEG1, so the
      // tag sits after the 17-byte side info, frames field -> duration
      // = frames * 1152 / rate, the correction every real player makes
      val vfr = (pmod(col("doc_id"), lit(5000)) + 1).cast("int")
      val cbr = concat(lit("FFFB"), b3, lit("00"),
        lit("00" * 512).substr(lit(1), n * 2))
      val vbr = concat(lit("FFFB"), b3, lit("C0"), lit("00" * 17),
        lit("58696E67"), lit("00000001"), lpad(hex(vfr), 8, "0"),
        lit("00" * 512).substr(lit(1), n * 2))
      val hdr = when(pmod(col("doc_id"), lit(2)) === 0, cbr).otherwise(vbr)
      t(s, dir, "documents")
        .select(col("doc_id"), MediaHeaders.mp3Info(unhex(hdr)).as("m"))
        .select(col("doc_id"), col("m.version_x10"), col("m.bitrate_kbps"),
          col("m.sample_rate"), col("m.duration_ms"))
    }),

    // ---- multimodal: REAL WAV header decode — canonical RIFF/WAVE bytes
    // synthesized from doc_id, metadata parsed back via pure hex/conv
    // expressions; duration = data bytes * 1000 / byte rate
    "m_wav_info" -> ((s, dir) => {
      import graft.multimodal.MediaHeaders
      val sr = (lit(8000) + pmod(col("doc_id"), lit(8)).cast("int") * 4000)
        .cast("int")
      val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
      val br = sr * ch * 2
      val ds = ((pmod(col("doc_id"), lit(1000)) + 1) * 256).cast("int")
      def le16hex(c: Column) = concat(
        lpad(hex(pmod(c, lit(256))), 2, "0"),
        lpad(hex((c / 256).cast("int")), 2, "0"))
      def le32hex(c: Column) = concat(
        le16hex(pmod(c, lit(65536)).cast("int")),
        le16hex((c / 65536).cast("int")))
      val hdr = concat(
        lit("52494646"), le32hex(ds + 36), lit("57415645"),
        lit("666D7420"), lit("10000000"), lit("0100"), le16hex(ch),
        le32hex(sr), le32hex(br), le16hex(ch * 2), lit("1000"),
        lit("64617461"), le32hex(ds))
      // payload materialized in its own projection: wavInfo reads ~20
      // byte offsets, each a hex/conv over the payload — inlining the
      // unhex(concat(...)) tree 20x cost ~1.3s at sf0.1
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(hdr).as("__wav"))
        .select(col("doc_id"), MediaHeaders.wavInfo(col("__wav")).as("w"))
        .select(col("doc_id"), col("w.sample_rate"), col("w.channels"),
          col("w.byte_rate"), col("w.duration_ms"))
    }),

    // ---- multimodal: REAL audio content decode — synthesized 16-bit
    // PCM WAVs carrying a square wave (amplitude/channels/length all
    // doc-deterministic, the doc_id%11 slice saturated at 32767 so the
    // clipping counter has live rows); the sample walker reads every
    // frame, so sum_abs/peak/n_clipped replay from closed-form
    // arithmetic in the oracle
    "m_audio_pcm" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      val sr = (lit(8000) + pmod(col("doc_id"), lit(8)).cast("int") * 4000)
        .cast("int")
      val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
      val amp = when(pmod(col("doc_id"), lit(11)) === 0, lit(32767))
        .otherwise(pmod(col("doc_id") * 37, lit(32767)).cast("int"))
      val half = (pmod(col("doc_id"), lit(50)) + 1).cast("int")
      val nFrames = half * 2
      val ds = nFrames * ch * 2
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val neg = pmod(lit(65536) - amp, lit(65536))
      val pair = concat(rep(le16h(amp), ch), rep(le16h(neg), ch))
      val wav = concat(
        lit("52494646"), le32h(ds + 36), lit("57415645"),
        lit("666D7420"), lit("10000000"), lit("0100"), le16h(ch),
        le32h(sr), le32h(sr * ch * 2), le16h(ch * 2), lit("1000"),
        lit("64617461"), le32h(ds), rep(pair, half))
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(wav).as("__wav"))
        .select(col("doc_id"),
          MediaExtra.wavPcmScan(col("__wav")).as("__pcm"))
        .select(col("doc_id"),
          element_at(col("__pcm"), 1).cast("int").as("channels"),
          element_at(col("__pcm"), 2).cast("int").as("sample_rate"),
          element_at(col("__pcm"), 3).as("n_frames"),
          element_at(col("__pcm"), 4).as("sum_abs"),
          element_at(col("__pcm"), 5).as("peak"),
          element_at(col("__pcm"), 6).as("n_clipped"),
          // waveform-statistics slots (audio content embedding inputs):
          // exact squared-sample sum and per-channel sign flips
          element_at(col("__pcm"), 7).as("sum_sq"),
          element_at(col("__pcm"), 8).as("zero_crossings"),
          element_at(col("__pcm"), 9).cast("int").as("bps"))
    }),

    // ---- multimodal: REAL FLAC audio decode — a complete native frame
    // decoder (CONSTANT/VERBATIM/FIXED/LPC subframes, rice residuals,
    // stereo decorrelation). The oracled arm synthesizes single-frame
    // CONSTANT-subframe streams, which are byte-aligned by construction
    // (16-bit values after 1-byte subframe headers), so DuckDB replays
    // the stats in closed form; genuinely rice-coded FIXED/LPC streams
    // and the mid/side paths are pinned by MediaAudioSpec against an
    // independent test-side encoder (lossless codec -> bit-exact).
    "m_audio_flac" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      val rate = (lit(8000) + pmod(col("doc_id"), lit(8)).cast("int") * 4000)
        .cast("int")
      val ch = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
      val amp = when(pmod(col("doc_id"), lit(11)) === 0, lit(32767))
        .otherwise(pmod(col("doc_id") * 37, lit(32767)).cast("int"))
      val bs = ((pmod(col("doc_id"), lit(100)) + 1) * 16).cast("int")
      def be16h(c: Column) = lpad(hex(c), 4, "0")
      // STREAMINFO packed tail: rate(20) | ch-1(3) | bps-1=15(5) | total(36)
      val packed = shiftleft(rate.cast("long"), 44) +
        shiftleft((ch - 1).cast("long"), 41) +
        shiftleft(lit(15L), 36) + bs.cast("long")
      val neg = pmod(lit(65536) - amp, lit(65536))
      val subs = when(ch === 1, concat(lit("00"), be16h(amp)))
        .otherwise(concat(lit("00"), be16h(amp), lit("00"), be16h(neg)))
      val flac = concat(
        lit("664C6143" + "80000022"), be16h(bs), be16h(bs),
        lit("000000" + "000000"), lpad(hex(packed), 16, "0"), lit("0" * 32),
        lit("FFF8" + "7D"),                 // sync; bs code 7, rate code 13
        lpad(hex((ch - 1) * 16 + 8), 2, "0"), // chan asgn | bps code 4 | res
        lit("00"), be16h(bs - 1), be16h(rate), lit("00"), // frame# bs rate crc8
        subs, lit("0000"))                  // CONSTANT subframes, crc16
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(flac).as("__flac"))
        .select(col("doc_id"),
          MediaExtra.flacPcmScan(col("__flac")).as("__pcm"))
        .select(col("doc_id"),
          element_at(col("__pcm"), 1).cast("int").as("channels"),
          element_at(col("__pcm"), 2).cast("int").as("sample_rate"),
          element_at(col("__pcm"), 3).as("n_frames"),
          element_at(col("__pcm"), 4).as("sum_abs"),
          element_at(col("__pcm"), 5).as("peak"),
          element_at(col("__pcm"), 6).as("n_clipped"),
          // constant-subframe streams: squared-sum replays in closed
          // form, zero crossings are structurally zero
          element_at(col("__pcm"), 7).as("sum_sq"),
          element_at(col("__pcm"), 8).as("zero_crossings"),
          element_at(col("__pcm"), 9).cast("int").as("bps"))
    }),

    // ---- multimodal: REAL LOSSY audio decode #1 — G.711 mu-law/A-law
    // (ITU-T logarithmic companding, WAVE formats 7/6). Every companded
    // byte expands to its linear 16-bit value by the published Sun/CCITT
    // recurrence (MediaLossy.G711); the synthesized square wave
    // alternates a byte and its sign-flipped pair, so the oracle replays
    // the expansion formula itself in SQL (stateless per byte) and the
    // stats in closed form — REAL decode of a REAL lossy telephony codec
    // on both sides.
    "m_audio_g711" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val ulaw = pmod(col("doc_id"), lit(2)) === 0
      val fmtTag = when(ulaw, lit(7)).otherwise(lit(6)).cast("int")
      val ch = (pmod(expr("doc_id div 2"), lit(2)) + 1).cast("int")
      val sr = (lit(8000) * (pmod(expr("doc_id div 3"), lit(2)) + 1))
        .cast("int")
      val v = pmod(col("doc_id"), lit(128)).cast("int")
      val half = (pmod(col("doc_id"), lit(40)) + 1).cast("int")
      val dataLen = half * 2 * ch
      val pair = concat(rep(h2(v), ch), rep(h2(v + 128), ch))
      val wav = concat(
        lit("52494646"), le32h(dataLen + 38), lit("57415645"),
        lit("666D7420"), lit("12000000"), le16h(fmtTag), le16h(ch),
        le32h(sr), le32h(sr * ch), le16h(ch), lit("0800"), lit("0000"),
        lit("64617461"), le32h(dataLen), rep(pair, half))
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(wav).as("__wav"))
        .select(col("doc_id"),
          when(ulaw, "ulaw").otherwise("alaw").as("law"),
          MediaExtra.g711Scan(col("__wav")).as("__pcm"))
        .select(col("doc_id"), col("law"),
          element_at(col("__pcm"), 1).cast("int").as("channels"),
          element_at(col("__pcm"), 2).cast("int").as("sample_rate"),
          element_at(col("__pcm"), 3).as("n_frames"),
          element_at(col("__pcm"), 4).as("sum_abs"),
          element_at(col("__pcm"), 5).as("peak"),
          element_at(col("__pcm"), 6).as("n_clipped"),
          element_at(col("__pcm"), 7).as("sum_sq"),
          element_at(col("__pcm"), 8).as("zero_crossings"),
          element_at(col("__pcm"), 9).cast("int").as("bps"))
    }),

    // ---- multimodal: REAL LOSSY audio decode #2 — IMA/DVI ADPCM (WAVE
    // format 0x11, 4-bit adaptive deltas). The native decoder runs the
    // published IMA recurrence (step table walk, vpdiff accumulate, s16
    // clamp, index clamp) over genuinely varying nibbles; the DuckDB
    // oracle REPLAYS THE SAME RECURRENCE with a recursive CTE over the
    // 89-entry step table — a fully independent stateful re-decode, not
    // a closed-form shortcut.
    "m_audio_adpcm" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      val sr = (lit(8000) + pmod(col("doc_id"), lit(8)).cast("int") * 4000)
        .cast("int")
      val pred0 = pmod(col("doc_id") * 97, lit(4096)).cast("int") - 2048
      val idx0 = pmod(col("doc_id"), lit(89)).cast("int")
      val nb = (pmod(col("doc_id"), lit(16)) + 4).cast("int")
      val blockAlign = nb + 4
      // data bytes: nibble k = (doc*7 + 3k) mod 16, LOW nibble first ->
      // byte j = nib(2j) | nib(2j+1)<<4
      val bytesHex = expr(
        """array_join(transform(sequence(0, int(doc_id % 16) + 3), j ->
          |  lpad(hex(pmod(doc_id * 7 + 6*j, 16)
          |    + 16 * pmod(doc_id * 7 + 6*j + 3, 16)), 2, '0')), '')"""
          .stripMargin)
      val wav = concat(
        lit("52494646"), le32h(blockAlign + pmod(blockAlign, lit(2)) + 40),
        lit("57415645"),
        lit("666D7420"), lit("14000000"), lit("1100"), lit("0100"),
        le32h(sr), le32h(sr), le16h(blockAlign), lit("0400"),
        lit("0200"), le16h(nb * 2 + 1),
        lit("64617461"), le32h(blockAlign),
        le16h(pmod(pred0 + 65536, lit(65536))), h2(idx0), lit("00"),
        bytesHex,
        // RIFF even-byte pad after an odd-sized data chunk
        call_function("repeat", lit("00"),
          pmod(blockAlign, lit(2)).cast("int")))
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(wav).as("__wav"))
        .select(col("doc_id"),
          MediaExtra.adpcmScan(col("__wav")).as("__pcm"))
        .select(col("doc_id"),
          element_at(col("__pcm"), 1).cast("int").as("channels"),
          element_at(col("__pcm"), 2).cast("int").as("sample_rate"),
          element_at(col("__pcm"), 3).as("n_frames"),
          element_at(col("__pcm"), 4).as("sum_abs"),
          element_at(col("__pcm"), 5).as("peak"),
          element_at(col("__pcm"), 6).as("n_clipped"),
          element_at(col("__pcm"), 7).as("sum_sq"),
          element_at(col("__pcm"), 8).as("zero_crossings"),
          element_at(col("__pcm"), 9).cast("int").as("bps"))
    }),

    // ---- multimodal: REAL video sample-data decode — AVI/MJPEG. Each
    // doc synthesizes a complete AVI container (RIFF -> LIST hdrl with
    // avih/strh/strf -> LIST movi) holding 2..5 MJPEG frames, each frame
    // the byte-aligned solid-gray baseline JPEG the m_pixel_stats oracle
    // pinned, with a per-frame DC level. The native scan demuxes the
    // chunk tree and runs the FULL JPEG pipeline (Huffman + dequant +
    // exact IDCT) on every frame; the oracle replays container geometry,
    // per-frame gray levels (128 +/- dc by T.81 arithmetic), and the
    // cross-frame moment aggregation in closed form.
    "m_video_avi" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def jbe16(c: Column) = lpad(hex(c), 4, "0")
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val jw = (pmod(col("doc_id"), lit(4)) + 1).cast("int") * 8
      val jh = (pmod(col("doc_id"), lit(3)) + 1).cast("int") * 8
      val nMCU = (jw / 8) * (jh / 8)
      val fCnt = (pmod(col("doc_id"), lit(4)) + 2).cast("int")
      val upf = ((pmod(col("doc_id"), lit(3)) + 1) * 20000).cast("int")
      val jpegLen = nMCU + 142
      val pad = pmod(nMCU, lit(2)) // jpegLen odd iff nMCU odd
      // per-frame solid-gray baseline JPEG (the m_pixel_stats shape)
      def frameJpegHex(f: Int): Column = {
        val jd = pmod(col("doc_id") * 3 + lit(f * 5), lit(64))
          .cast("int") + 64
        val pos = pmod(col("doc_id") + lit(f), lit(2)) === 0
        val vbits = when(pos, jd).otherwise(lit(127) - jd)
        concat(
          lit("FFD8"),
          lit("FFDB004300"), rep(lit("08"), lit(64)),
          lit("FFC0000B08"), jbe16(jh), jbe16(jw), lit("01011100"),
          lit("FFC4001500"),
          lit("00000101000000000000000000000000"), lit("0007"),
          lit("FFC4001410"),
          lit("00000000010000000000000000000000"), lit("00"),
          lit("FFDA0008010100003F00"),
          h2(lit(32) + (vbits / 8).cast("int")),
          h2(pmod(vbits, lit(8)) * 32),
          rep(lit("00"), nMCU - 1),
          lit("FFD9"))
      }
      def frameChunk(f: Int): Column =
        when(lit(f) < fCnt,
          concat(lit("30306463"), le32h(jpegLen), frameJpegHex(f),
            rep(lit("00"), pad))).otherwise(lit(""))
      val frameBytes = jpegLen + pad + 8
      val moviSz = fCnt * frameBytes + 4
      val z32 = lit("00000000")
      val avih = concat(lit("61766968"), le32h(lit(56)),
        le32h(upf), z32, z32, z32, le32h(fCnt), z32, le32h(lit(1)), z32,
        le32h(jw), le32h(jh), z32, z32, z32, z32)
      val strh = concat(lit("73747268"), le32h(lit(56)),
        lit("76696473"), lit("4D4A5047"), z32, lit("0000"), lit("0000"),
        z32, le32h(upf), le32h(lit(1000000)), z32, le32h(fCnt), z32, z32,
        z32, lit("0000"), lit("0000"), le16h(jw), le16h(jh))
      val strf = concat(lit("73747266"), le32h(lit(40)),
        le32h(lit(40)), le32h(jw), le32h(jh), lit("0100"), lit("1800"),
        lit("4D4A5047"), z32, z32, z32, z32, z32)
      val strl = concat(lit("4C495354"), le32h(lit(116)),
        lit("7374726C"), strh, strf)
      val hdrl = concat(lit("4C495354"), le32h(lit(192)),
        lit("6864726C"), avih, strl)
      val aviHex = concat(Seq(
        lit("52494646"), le32h(moviSz + 212), lit("41564920"),
        hdrl,
        lit("4C495354"), le32h(moviSz), lit("6D6F7669")) ++
        (0 until 5).map(frameChunk): _*)
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(aviHex).as("__avi"))
        .select(col("doc_id"),
          MediaExtra.aviScan(col("__avi")).as("__v"))
        .select(col("doc_id") +: Seq(
          "width", "height", "us_per_frame", "total_frames", "n_frames",
          "sum_r", "sum_g", "sum_b", "n_px", "min_ch", "max_ch",
          "sq_r", "sq_g", "sq_b", "duration_ms")
          .zipWithIndex.map { case (n, i) =>
            element_at(col("__v"), i + 1).as(n) }: _*)
    }),

    // ---- multimodal: shot-boundary (scene-cut) detection — the
    // temporal video operator a 100-TB ingest runs over every clip.
    // Scene-structured AVIs (runs of identical-DC MJPEG frames, a new
    // gray level every `runlen` frames) are demuxed by the PER-FRAME
    // means scan (stream order preserved through nested lists), frames
    // explode to rows, and the classic luminance-delta detector runs as
    // a lag window per clip: |sum_rgb(f) - sum_rgb(f-1)| > 12*n_px
    // (i.e. >4 gray levels), scene_id = running cut count. State is one
    // row per frame, partitioned by clip — the shape that scales to a
    // billion clips. The oracle replays frame grays closed-form and the
    // same window arithmetic in DuckDB.
    "m_scene_cuts" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import graft.multimodal.MediaExtra
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def jbe16(c: Column) = lpad(hex(c), 4, "0")
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val jw = (pmod(col("doc_id"), lit(2)) + 1).cast("int") * 8
      val jh = lit(8)
      val nMCU = (jw / 8).cast("int")
      val fCnt = (pmod(col("doc_id"), lit(4)) + 6).cast("int") // 6..9
      val runlen = (pmod(col("doc_id"), lit(2)) + 2).cast("int") // 2..3
      val jpegLen = nMCU + 142
      val pad = pmod(nMCU, lit(2))
      def frameJpegHex(f: Int): Column = {
        // scene s = f div runlen; positive DC only (gray 192..255)
        val sc = floor(lit(f) / runlen).cast("int")
        val jd = pmod(col("doc_id") * 3 + sc * 17, lit(64))
          .cast("int") + 64
        concat(
          lit("FFD8"),
          lit("FFDB004300"), rep(lit("08"), lit(64)),
          lit("FFC0000B08"), jbe16(jh), jbe16(jw), lit("01011100"),
          lit("FFC4001500"),
          lit("00000101000000000000000000000000"), lit("0007"),
          lit("FFC4001410"),
          lit("00000000010000000000000000000000"), lit("00"),
          lit("FFDA0008010100003F00"),
          h2(lit(32) + (jd / 8).cast("int")),
          h2(pmod(jd, lit(8)) * 32),
          rep(lit("00"), nMCU - 1),
          lit("FFD9"))
      }
      def frameChunk(f: Int): Column =
        when(lit(f) < fCnt,
          concat(lit("30306463"), le32h(jpegLen), frameJpegHex(f),
            rep(lit("00"), pad))).otherwise(lit(""))
      val frameBytes = jpegLen + pad + 8
      val moviSz = fCnt * frameBytes + 4
      val z32 = lit("00000000")
      val avih = concat(lit("61766968"), le32h(lit(56)),
        le32h(lit(40000)), z32, z32, z32, le32h(fCnt), z32,
        le32h(lit(1)), z32, le32h(jw), le32h(jh), z32, z32, z32, z32)
      val hdrlSz = 4 + 64 // avih only — strl is optional for the demux
      val aviHex = concat(Seq(
        lit("52494646"), le32h(moviSz + 20 + hdrlSz), lit("41564920"),
        lit("4C495354"), le32h(lit(hdrlSz)), lit("6864726C"), avih,
        lit("4C495354"), le32h(moviSz), lit("6D6F7669")) ++
        (0 until 9).map(frameChunk): _*)
      val w = Window.partitionBy("doc_id").orderBy("frame_idx")
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(aviHex).as("__avi"))
        .select(col("doc_id"),
          MediaExtra.aviFrameScan(col("__avi")).as("__fm"))
        .select(col("doc_id"), posexplode(expr(
          """transform(sequence(1, int(element_at(__fm, 1))), f ->
            |  struct(element_at(__fm, 4*f - 2) + element_at(__fm, 4*f - 1)
            |           + element_at(__fm, 4*f) as sum_rgb,
            |         element_at(__fm, 4*f + 1) as n_px))"""
            .stripMargin)).as(Seq("frame_idx", "fr")))
        .select(col("doc_id"), col("frame_idx"),
          col("fr.sum_rgb").as("sum_rgb"), col("fr.n_px").as("n_px"))
        .withColumn("__prev", lag("sum_rgb", 1).over(w))
        .withColumn("is_cut", when(col("__prev").isNull, 0)
          .when(abs(col("sum_rgb") - col("__prev")) > col("n_px") * 12, 1)
          .otherwise(0))
        .withColumn("scene_id", sum("is_cut").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("doc_id"), col("frame_idx"), col("sum_rgb"),
          col("n_px"), col("is_cut"), col("scene_id"))
    }),

    // ---- multimodal: cross-clip duplicate-FRAME detection — the video
    // analog of exact dedup (repeated intros, thumbnails, test cards).
    // Engineered collisions (16 possible gray levels across all clips,
    // fixed 8x8 geometry) make frames bit-identical across docs; the
    // per-frame demux emits moment fingerprints and a plain hash
    // aggregate groups them corpus-wide: map-side combinable, one
    // shuffle of (fingerprint, partial counts) — at 100 TB this is the
    // same shape as d_dedup_exact, with the fingerprint standing in for
    // the frame sha. The oracle replays frame grays and the group-by.
    "m_frame_dedup" -> ((s, dir) => {
      import graft.multimodal.MediaExtra
      def h2(c: Column) = lpad(hex(c), 2, "0")
      def le16h(c: Column) = concat(h2(pmod(c, lit(256))),
        h2((c / 256).cast("int")))
      def le32h(c: Column) = concat(le16h(pmod(c, lit(65536))),
        le16h((c / 65536).cast("int")))
      def rep(unit: Column, times: Column) =
        call_function("repeat", unit, times.cast("int"))
      val fCnt = (pmod(col("doc_id"), lit(3)) + 3).cast("int") // 3..5
      val jpegLen = lit(143) // nMCU = 1 at 8x8
      def frameJpegHex(f: Int): Column = {
        val jd = pmod(col("doc_id") + lit(f * 7), lit(16)).cast("int") * 4 +
          64 // gray = 192 + ((doc+7f) mod 16)*4 — 16 levels, collisions
        concat(
          lit("FFD8"),
          lit("FFDB004300"), rep(lit("08"), lit(64)),
          lit("FFC0000B08"), lit("0008"), lit("0008"), lit("01011100"),
          lit("FFC4001500"),
          lit("00000101000000000000000000000000"), lit("0007"),
          lit("FFC4001410"),
          lit("00000000010000000000000000000000"), lit("00"),
          lit("FFDA0008010100003F00"),
          h2(lit(32) + (jd / 8).cast("int")),
          h2(pmod(jd, lit(8)) * 32),
          lit("FFD9"))
      }
      def frameChunk(f: Int): Column =
        when(lit(f) < fCnt,
          concat(lit("30306463"), le32h(jpegLen), frameJpegHex(f),
            lit("00"))).otherwise(lit("")) // 143 is odd -> pad byte
      val frameBytes = 152 // 8 + 143 + 1
      val moviSz = fCnt * frameBytes + 4
      val z32 = lit("00000000")
      val avih = concat(lit("61766968"), le32h(lit(56)),
        le32h(lit(40000)), z32, z32, z32, le32h(fCnt), z32,
        le32h(lit(1)), z32, le32h(lit(8)), le32h(lit(8)),
        z32, z32, z32, z32)
      val aviHex = concat(Seq(
        lit("52494646"), le32h(moviSz + 88), lit("41564920"),
        lit("4C495354"), le32h(lit(68)), lit("6864726C"), avih,
        lit("4C495354"), le32h(moviSz), lit("6D6F7669")) ++
        (0 until 5).map(frameChunk): _*)
      t(s, dir, "documents")
        .select(col("doc_id"), unhex(aviHex).as("__avi"))
        .select(col("doc_id"),
          MediaExtra.aviFrameScan(col("__avi")).as("__fm"))
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, int(element_at(__fm, 1))), f ->
            |  struct(element_at(__fm, 4*f - 2) + element_at(__fm, 4*f - 1)
            |           + element_at(__fm, 4*f) as sum_rgb,
            |         element_at(__fm, 4*f + 1) as n_px))"""
            .stripMargin)).as("fr"))
        .select(col("doc_id"), col("fr.sum_rgb").as("sum_rgb"),
          col("fr.n_px").as("n_px"))
        .groupBy("sum_rgb", "n_px")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("doc_id")).as("n_clips"))
        .filter(col("n_frames") > 1)
    }),

    // ---- source ingest: WARC (ISO 28500) — the format web-scale
    // corpora arrive in (Common Crawl ships ~100 TB/crawl of .warc.gz).
    // Each doc synthesizes a shard of three records (warcinfo + two
    // HTTP responses); odd docs wrap EACH record in its own gzip member
    // (the Common Crawl layout) with a REAL CRC32 (Spark's crc32 — the
    // JDK GZIPInputStream verifies it on inflate, so a wrong byte
    // anywhere fails loudly). Warc.records explodes shards to typed
    // rows inside mapPartitions — no shuffle, embarrassingly parallel
    // over shard files. The oracle replays record geometry, HTTP
    // fields, and the per-record body sha256 closed-form.
    "w_warc" -> ((s, dir) => {
      import s.implicits._
      import graft.data.Warc
      val lp = lpad(col("doc_id").cast("string"), 8, "0")
      val k = (pmod(col("doc_id"), lit(5)) + 1).cast("int")
      val infoRec = concat(
        lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 17\r\n"),
        lit("\r\nsoftware: graft\r\n"), lit("\r\n\r\n"))
      def rec(r: Int): Column = {
        val bl = (k + lit(r)) * 10
        val statusLine =
          if (r == 0) "HTTP/1.1 200 OK\r\n" else "HTTP/1.1 404 Not Found\r\n"
        val body = call_function("repeat",
          concat(lit("w"), lp, lit(" ")), k + lit(r))
        val http = concat(lit(statusLine),
          lit("Content-Type: text/plain\r\n"),
          lit("Content-Length: "), bl.cast("string"), lit("\r\n\r\n"),
          body)
        val hl = lit(statusLine.length + 48) + bl
        concat(lit("WARC/1.0\r\nWARC-Type: response\r\n" +
          "WARC-Target-URI: https://ex.org/"),
          lp, lit(s"/$r\r\nContent-Length: "), hl.cast("string"),
          lit("\r\n\r\n"), http, lit("\r\n\r\n"))
      }
      val plain = encode(concat(infoRec, rec(0), rec(1)), "UTF-8")
      val gz = concat(gzMember(infoRec), gzMember(rec(0)), gzMember(rec(1)))
      val payload = when(pmod(col("doc_id"), lit(2)) === 0, plain)
        .otherwise(gz)
      val shards = t(s, dir, "documents")
        .select(col("doc_id"), payload.as("p"))
        .as[(Long, Array[Byte])]
      Warc.records(shards).toDF()
        .select(col("shard_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"), col("http_status"),
          col("content_type"), col("body_len"), col("body_sha256"),
          col("compressed"))
    }),

    // ---- HTML main-text extraction (graft.text.HtmlOps) — the step
    // between WARC response payloads and the text pipeline. Each doc
    // renders a full page (doctype; title with a decimal entity; style
    // and script raw blocks carrying decoy markup; a comment hiding
    // tags; a heading; the doc's text HTML-escaped; inline tags; a tab
    // and double space for the collapser; two anchors). The native
    // single-pass extractor recovers title / visible text / links and
    // the oracle replays the expected extraction closed-form from the
    // table columns. The struct is staged in its own projection so the
    // walk runs ONCE per row (CollapseProject refuses to duplicate the
    // non-cheap expression across the four field reads).
    "w_html" -> ((s, dir) => {
      import graft.text.HtmlOps
      val ids = col("doc_id").cast("string")
      val lp = lpad(ids, 8, "0")
      val esc = call_function("replace",
        call_function("replace",
          call_function("replace", col("text"), lit("&"), lit("&amp;")),
          lit("<"), lit("&lt;")),
        lit(">"), lit("&gt;"))
      val page = concat(
        lit("<!DOCTYPE html>\n<html>\n<head>\n  <title>Doc "), ids,
        lit(" &#8212; "), col("source"), lit("</title>\n"),
        lit("  <style>p > b { color: \"red&blue\"; }</style>\n"),
        lit("  <script>if (1 < 2 && go) { s = \"<b>no</b>\"; }</script>\n"),
        lit("</head>\n<body>\n  <!-- draft <p>skip me</p> -->\n"),
        lit("  <h1>Heading &amp; "), ids, lit("</h1>\n  <p>"), esc,
        lit("</p>\n  <p>Lang:\t<b>"), col("lang"),
        lit("</b> &#x2014;  chars: "), col("n_chars").cast("string"),
        lit("</p>\n  <a href=\"https://ex.org/"), lp,
        lit("/a\">first</a> and\n  <a href='/rel/"), ids,
        lit("'>second</a>\n</body>\n</html>"))
      t(s, dir, "documents")
        .select(col("doc_id"), HtmlOps.htmlExtractCol(page).as("h"))
        .select(col("doc_id"),
          col("h.title").as("title"),
          col("h.text").as("text"),
          concat_ws("|", col("h.links")).as("links"),
          size(col("h.links")).as("n_links"),
          col("h.n_blocks").as("n_blocks"))
    }),

    // ---- RFC 3986 URL canonicalization (graft.functions.UrlOps) — the
    // cheapest web-dedup tier: scheme/host case, default ports, percent
    // normalization, dot segments, empty path, fragment strip; a mailto
    // row (doc_id%7=0) exercises the null (non-hierarchical) path. The
    // oracle replays the CANONICAL form closed-form per variant — it
    // never runs the algorithm, it knows the answers.
    "w_url" -> ((s, dir) => {
      import graft.functions.UrlOps
      val ids = col("doc_id").cast("string")
      val v = pmod(col("doc_id"), lit(6))
      val messy = when(pmod(col("doc_id"), lit(7)) === 0,
          lit("mailto:user@ex.org"))
        .when(v === 0,
          concat(lit("HTTP://EX.ORG:80/a/"), ids, lit("/x/../b?q=1&q=2#frag")))
        .when(v === 1, concat(lit("https://Ex.Org:443/p%61th/"), ids))
        .when(v === 2, concat(lit("http://ex.org/%2fkeep/"), ids))
        .when(v === 3, lit("https://user@ex.org?x=%7e"))
        .when(v === 4, concat(lit("http://ex.org/./"), ids, lit("/./c")))
        .otherwise(concat(lit("HTTPS://ex.org:8443/"), ids, lit("#x")))
      t(s, dir, "documents")
        .select(col("doc_id"), messy.as("url"))
        .select(col("doc_id"), col("url"),
          UrlOps.urlCanonCol(col("url")).as("canon"))
    }),

    // ---- the Common-Crawl pipeline end-to-end (graft.text.WebClean):
    // WARC shards -> response pages -> 200+text/html envelope filter ->
    // URL canonicalization -> HTML text extraction (map-only, BEFORE
    // any shuffle) -> earliest-crawl URL dedup -> token-count quality
    // gate -> content-hash exact dedup. Each shard carries six records:
    // a warcinfo, the group's main page under one of three messy
    // spellings of the same canonical URL (3 docs/group crawl the same
    // page -> URL dedup keeps the earliest), a 404, a text/plain 200, a
    // too-short spam page (gate drop), and a boilerplate legal page
    // identical across ALL shards (content dedup keeps exactly one).
    // Odd shards wrap each record in its own CRC32-verified gzip
    // member. The oracle replays every surviving row — who survives,
    // its canonical URL, title, token count, and the sha256 of the
    // extracted text — closed-form from the documents table.
    "w_pipeline" -> ((s, dir) => {
      import s.implicits._
      import graft.text.WebClean
      val d = col("doc_id")
      val ids = d.cast("string")
      val g = expr("doc_id div 3")
      val gs = g.cast("string")
      val mainHtml = concat(
        lit("<html><head><title>Page "), gs,
        lit("</title></head><body>\n<p>Group "), gs, lit(" says "),
        call_function("repeat", concat(lit("tok"), gs, lit(" ")),
          (pmod(g, lit(4)) + 6).cast("int")),
        lit("end.</p>\n</body></html>"))
      val mainUri = when(pmod(d, lit(3)) === 0,
          concat(lit("http://site.org/page/"), gs))
        .when(pmod(d, lit(3)) === 1,
          concat(lit("HTTP://SITE.ORG:80/page/"), gs, lit("#top")))
        .otherwise(concat(lit("http://site.org/x/../page/"), gs))
      def html200(body: Column) = concat(
        lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"), body)
      val recCols = Seq(
        warcRec("warcinfo", null, lit("software: graft\r\n")),
        warcRec("response", mainUri, html200(mainHtml)),
        warcRec("response", concat(lit("http://site.org/missing/"), ids),
          concat(lit("HTTP/1.1 404 Not Found\r\nContent-Type: text/html"
            + "\r\n\r\n"),
            lit("<html><body><p>not here at all my friend</p></body></html>"))),
        warcRec("response", concat(lit("http://site.org/robots/"), ids),
          lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
            + "User-agent: * Disallow: /private")),
        warcRec("response", concat(lit("http://site.org/spam/"), ids),
          html200(lit("<html><body><p>buy now cheap</p></body></html>"))),
        warcRec("response", concat(lit("http://site.org/legal/"), ids),
          html200(lit("<html><head><title>Legal</title></head><body><p>"
            + "terms of service apply to all pages equally forever"
            + "</p></body></html>"))))
      // even shards plain-concatenated; odd shards in the Common Crawl
      // per-record-gzip-member layout
      val payload = when(pmod(d, lit(2)) === 0,
          encode(concat(recCols: _*), "UTF-8"))
        .otherwise(concat(recCols.map(gzMember): _*))
      val shards = t(s, dir, "documents")
        .select(d, payload.as("p"))
        .as[(Long, Array[Byte])]
      WebClean.run(shards, minTokens = 5)
        .select(col("shard_id"), col("rec_idx"), col("url"), col("title"),
          col("n_tokens"), col("text_sha256"))
    }),

    // ---- robots.txt crawl-policy verdicts (graft.text.Robots, RFC
    // 9309) — seven synthetic per-host policies covering the grammar:
    // exact-agent group shadowing `*` (h0, h6), wildcard + `$`-anchored
    // patterns (h1, h5), empty Disallow (h2), multi-agent groups with a
    // malformed line (h3), rules before any group ignored (h4), a host
    // with no robots.txt at all (h7), comments, CRLF, case-insensitive
    // field names, crawl-delay attribution only from the SELECTED
    // group. Six path variants per doc hit every precedence branch:
    // longest-match wins, allow beats disallow on a tie, no-match =
    // allowed. The policy dimension is broadcast; URLs are evaluated
    // map-only inside their own scan (zero URL-side shuffles). The
    // oracle KNOWS each (host, variant) verdict closed-form — it never
    // runs the matcher.
    "w_robots" -> ((s, dir) => {
      import s.implicits._
      import graft.text.Robots
      val robotsTxt: Seq[(Int, String)] = Seq(
        0 -> ("# graft policy\nUser-agent: GraftBot\nDisallow: /private/\n"
          + "Allow: /private/ok$\nCrawl-delay: 2\n\n"
          + "User-agent: *\nDisallow: /\n"),
        1 -> ("User-agent: *\nDisallow: /*.json$\nAllow: /data/\n"
          + "Disallow: /data/tmp/\n"),
        2 -> ("User-agent: Other\nDisallow: /\n\n"
          + "User-agent: *\nDisallow:\nCrawl-delay: 1.5\n"),
        3 -> ("User-agent: GraftBot\nUser-agent: OtherBot\n"
          + "Disallow: /x*y/\nthis line is not a rule\nAllow: /x\n"),
        4 -> ("Disallow: /ignored-before-any-group\n"
          + "User-agent: *\nAllow: /a/b\nDisallow: /a/*\n"),
        5 -> "user-AGENT: *\r\nDisAllow: /end$\r\nallow: /e # comment\r\n",
        6 -> ("Sitemap: https://h6.example/sitemap.xml\n"
          + "User-agent: GraftBot\nAllow: /\n\n"
          + "User-agent: *\nCrawl-delay: 9\nDisallow: /\n"))
      val rules = s.createDataset(robotsTxt)
        .flatMap { case (h, txt) => Robots.parse(s"h$h", txt) }
      val d = col("doc_id")
      val v = pmod(d, lit(6))
      val pathq = when(v === 0, lit("/private/ok"))
        .when(v === 1, lit("/private/secret"))
        .when(v === 2, lit("/data/tmp/file.json"))
        .when(v === 3, lit("/a/b"))
        .when(v === 4, lit("/end"))
        .otherwise(concat(lit("/x"), d.cast("string"), lit("y/page")))
      val pages = t(s, dir, "documents").select(d,
        concat(lit("h"), pmod(d, lit(8)).cast("string")).as("host"),
        pathq.as("pathq"))
      Robots.evaluate(pages, rules, "GraftBot")
        .select(col("doc_id"), col("host"), col("pathq"), col("allowed"),
          col("rule"), col("rtype"), col("spec"), col("crawl_delay"))
    }),

    // ---- fixed-point PageRank over a synthetic link graph (graft.web
    // .LinkGraph) — ring + hub + jump edges derived from doc_id give
    // every node an out-edge (no dangling mass) and node 0 a heavy
    // in-degree (the mega-hub the map-side combiner must absorb). Ranks
    // are BIGINT units of 1e-10 so every sum is exact and associative:
    // the result is bit-identical at any parallelism and the DuckDB
    // oracle REPLAYS the same five damped iterations in unrolled SQL —
    // same integer arithmetic, different engine.
    "w_pagerank" -> ((s, dir) => {
      import graft.web.LinkGraph
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val d = col("doc_id")
      val ring = docs.select(d.as("src"), pmod(d + 1, lit(n)).as("dst"))
      val hub = docs.filter(pmod(d, lit(3)) === 1)
        .select(d.as("src"), lit(0L).as("dst"))
      val jump = docs.filter(pmod(d, lit(5)) === 2)
        .select(d.as("src"), pmod(d * 7 + 3, lit(n)).as("dst"))
      val nodes = docs.select(d.as("node"))
      LinkGraph.pageRank(ring.union(hub).union(jump), nodes, iterations = 5)
        .select(col("node"), col("rank"))
    }),

    // ---- host-level link graph (the Common-Crawl "host graph"
    // artifact): page links collapse to weighted host->host edges in
    // one map-side-combined groupBy; self-edges dropped here to
    // exercise the filter. Oracle is the same aggregation in SQL.
    "w_hostgraph" -> ((s, dir) => {
      import graft.web.LinkGraph
      val d = col("doc_id")
      val links = t(s, dir, "documents").select(
        concat(lit("h"), pmod(d, lit(5)).cast("string")).as("src_host"),
        concat(lit("h"), pmod(d * 3 + 1, lit(7)).cast("string")).as("dst_host"))
      LinkGraph.hostGraph(links, keepSelf = false)
        .select(col("src_host"), col("dst_host"), col("n_links"))
    }),

    // ---- sitemap XML ingest (graft.web.Sitemap, sitemaps.org 0.9) —
    // the discovery companion of w_robots (Robots.parse already
    // surfaces the Sitemap: lines). Four synthesized per-doc variants
    // cover the grammar: a two-url urlset (lastmod + changefreq +
    // priority; &amp; entity in a loc), a sitemapindex with an XML
    // comment and a calendar-INVALID lastmod (raw text kept, parsed
    // day null), a namespace-prefixed urlset with a CDATA loc (no
    // entity decode inside), an out-of-range priority and an
    // upper-case changefreq, and a non-sitemap document yielding zero
    // rows. Host-dimension flatMap — map-only, no shuffle (the
    // Robots.parse shape). The oracle knows every entry closed-form.
    "w_sitemap" -> ((s, dir) => {
      import s.implicits._
      import graft.web.Sitemap
      val d = col("doc_id")
      val hostS = concat(lit("h"), pmod(d, lit(8)).cast("string"),
        lit(".example"))
      val ds = d.cast("string")
      val v = pmod(d, lit(4))
      val xml = when(v === 0, concat(
          lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<urlset "
            + "xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
            + "<url><loc>https://"), hostS, lit("/p"), ds,
          lit("a</loc><lastmod>2024-01-15</lastmod>"
            + "<changefreq>daily</changefreq>"
            + "<priority>0.5</priority></url>\n<url> <loc>https://"),
          hostS, lit("/p"), ds,
          lit("b?x=1&amp;y=2</loc><priority>1.0</priority></url>\n"
            + "</urlset>")))
        .when(v === 1, concat(
          lit("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/"
            + "sitemap/0.9\"><!-- nightly index -->\n<sitemap>"
            + "<loc>https://"), hostS, lit("/sm"), ds,
          lit(".xml</loc><lastmod>2024-02-30T10:00:00Z</lastmod>"
            + "</sitemap>\n</sitemapindex>")))
        .when(v === 2, concat(
          lit("<sm:urlset xmlns:sm=\"http://www.sitemaps.org/schemas/"
            + "sitemap/0.9\">\n<sm:url><sm:loc><![CDATA[https://"),
          hostS, lit("/c"), ds,
          lit("?a=1&b=2]]></sm:loc>"
            + "<sm:lastmod>2023-12-01T08:30:00+02:00</sm:lastmod>"
            + "<sm:changefreq>WEEKLY</sm:changefreq>"
            + "<sm:priority>1.5</sm:priority></sm:url>\n</sm:urlset>")))
        .otherwise(concat(lit("<html><body>not a sitemap "), ds,
          lit("</body></html>")))
      t(s, dir, "documents")
        .select(hostS.as("host"), xml.as("xml"))
        .as[(String, String)]
        .flatMap { case (h, x) => Sitemap.parse(h, x) }
        .toDF()
        .select(col("host"), col("kind"), col("loc"), col("lastmod"),
          col("lastmodDay").as("lastmod_day"), col("changefreq"),
          col("priorityMilli").as("priority_milli"))
    }),

    // ---- politeness-aware crawl-frontier scheduling (graft.web
    // .Frontier): per-host fetch queues capped by the bounded-heap
    // TopK aggregator (k rows per host per partition cross the ONE
    // exchange — the budget cap doubling as the mega-host skew valve),
    // queue ordinals free from the sorted top-k state via posexplode
    // (no window, no second sort), Crawl-delay as exact DECIMAL→ms
    // integers, shard = pmod(hash60(host), nShards) keeping every
    // host's queue on one worker. The oracle replays the schedule with
    // an independent SQL window + the md5 hash60 shard placement.
    "w_frontier" -> ((s, dir) => {
      import graft.web.Frontier
      val d = col("doc_id")
      val cands = t(s, dir, "documents").select(
        concat(lit("h"), pmod(d, lit(40)).cast("string")).as("host"),
        d.as("page_id"),
        pmod(d * 31 + 7, lit(1000)).as("weight"))
      val delays = s.range(40).toDF("k")
        .filter(pmod(col("k"), lit(3)) === 0)
        .select(concat(lit("h"), col("k").cast("string")).as("host"),
          Frontier.delayMs(concat(col("k").cast("string"), lit(".5")))
            .as("delay_ms"))
      Frontier.schedule(cands, delays, maxPerHost = 5, nShards = 8)
        .select(col("host"), col("shard"), col("slot"), col("page_id"),
          col("weight"), col("delay_ms"), col("fetch_offset_ms"))
    }),

    // ---- anchor-text aggregation per canonical link target (the
    // classic link-text relevance signal search corpora index): the
    // HTML walk yields (links, anchors) ALIGNED arrays in one pass,
    // arrays_zip + explode pairs them, UrlOps canonicalization merges
    // the casing/port/escape variants of the same target (two of the
    // three synthesized anchors point at one canonical URL), then ONE
    // hash aggregate per target. Inline tags inside the anchor vanish,
    // entities decode (&amp; in the anchor TEXT).
    "w_anchors" -> ((s, dir) => {
      import graft.text.HtmlOps
      import graft.functions.UrlOps
      val d = col("doc_id")
      val ks = pmod(d, lit(50)).cast("string")
      val ms = pmod(d, lit(7)).cast("string")
      val ds = d.cast("string")
      val page = concat(
        lit("<html><body><p>intro</p>\n<a href=\"https://T"), ks,
        lit(".EXAMPLE/home\">Home of "), ks,
        lit("</a>\n<a href='https://t"), ks,
        lit(".example:443/home'>Site&amp;"), ks,
        lit("</a>\n<a href=\"https://other"), ms,
        lit(".example/x%7Ey\">ref <b>"), ds,
        lit("</b></a>\n</body></html>"))
      t(s, dir, "documents")
        .select(HtmlOps.htmlExtractCol(page).as("h"))
        .select(explode(arrays_zip(
          col("h.links"), col("h.anchors"))).as("la"))
        .select(
          UrlOps.urlCanonCol(col("la.links")).as("target"),
          col("la.anchors").as("anchor"))
        .groupBy(col("target"))
        .agg(count(lit(1)).as("n_refs"),
          countDistinct(col("anchor")).as("n_texts"),
          min(col("anchor")).as("first_anchor"))
    }),

    // ---- HITS hubs & authorities (graft.web.LinkGraph.hits) over the
    // SAME synthetic link graph as w_pagerank — Kleinberg's
    // topic-distillation signal in exact fixed-point form: BIGINT
    // units of 1e-6, L-infinity renormalization (the round's MAX is
    // exact where L2's sqrt is not), three I-then-O rounds.
    // Bit-identical at any parallelism; the oracle replays the same
    // three rounds as unrolled SQL in HUGEINT arithmetic.
    "w_hits" -> ((s, dir) => {
      import graft.web.LinkGraph
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val d = col("doc_id")
      val ring = docs.select(d.as("src"), pmod(d + 1, lit(n)).as("dst"))
      val hubE = docs.filter(pmod(d, lit(3)) === 1)
        .select(d.as("src"), lit(0L).as("dst"))
      val jump = docs.filter(pmod(d, lit(5)) === 2)
        .select(d.as("src"), pmod(d * 7 + 3, lit(n)).as("dst"))
      val nodes = docs.select(d.as("node"))
      LinkGraph.hits(ring.union(hubE).union(jump), nodes, iterations = 3)
        .select(col("node"), col("auth"), col("hub"))
    }),

    // ---- TrustRank (graft.web.LinkGraph.trustRank) over the SAME
    // synthetic link graph as w_pagerank — the VLDB'04 anti-spam
    // prior: teleport restricted to a trusted seed set (every 17th
    // doc), trust flows along links, pages no trusted page reaches
    // score exactly 0. Four fixed-point rounds in BIGINT units of
    // 1e-10; the oracle replays them as unrolled SQL.
    "w_trustrank" -> ((s, dir) => {
      import graft.web.LinkGraph
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val d = col("doc_id")
      val ring = docs.select(d.as("src"), pmod(d + 1, lit(n)).as("dst"))
      val hubE = docs.filter(pmod(d, lit(3)) === 1)
        .select(d.as("src"), lit(0L).as("dst"))
      val jump = docs.filter(pmod(d, lit(5)) === 2)
        .select(d.as("src"), pmod(d * 7 + 3, lit(n)).as("dst"))
      val nodes = docs.select(d.as("node"))
      val seeds = docs.filter(pmod(d, lit(17)) === 0).select(d.as("node"))
      LinkGraph.trustRank(ring.union(hubE).union(jump), nodes, seeds,
        iterations = 4)
        .select(col("node"), col("trust"))
    }),

    // ---- label-propagation community detection (LinkGraph.labelProp)
    // over the SAME synthetic link graph — the deterministic
    // synchronous LPA variant (neighbor majority, min-label ties),
    // three rounds, all-integer; communities = shared labels. The
    // oracle replays the rounds as unrolled SQL windows.
    "w_labelprop" -> ((s, dir) => {
      import graft.web.LinkGraph
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val d = col("doc_id")
      val ring = docs.select(d.as("src"), pmod(d + 1, lit(n)).as("dst"))
      val hubE = docs.filter(pmod(d, lit(3)) === 1)
        .select(d.as("src"), lit(0L).as("dst"))
      val jump = docs.filter(pmod(d, lit(5)) === 2)
        .select(d.as("src"), pmod(d * 7 + 3, lit(n)).as("dst"))
      val nodes = docs.select(d.as("node"))
      LinkGraph.labelProp(ring.union(hubE).union(jump), nodes,
        iterations = 3)
        .select(col("node"), col("label"))
    }),

    // ---- per-node triangle counts (LinkGraph.triangles) over the
    // SAME synthetic link graph — degree-ordered node-iterator++
    // (Suri/Vassilvitskii WWW'11): wedges enumerate only at each
    // triangle's lowest-(degree,id) corner, so hub out-degree is
    // O(sqrt(m)) and the count stays exact. The oracle replays the
    // orientation and both joins in SQL.
    "w_triangles" -> ((s, dir) => {
      import graft.web.LinkGraph
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val d = col("doc_id")
      val ring = docs.select(d.as("src"), pmod(d + 1, lit(n)).as("dst"))
      val hubE = docs.filter(pmod(d, lit(3)) === 1)
        .select(d.as("src"), lit(0L).as("dst"))
      val jump = docs.filter(pmod(d, lit(5)) === 2)
        .select(d.as("src"), pmod(d * 7 + 3, lit(n)).as("dst"))
      val nodes = docs.select(d.as("node"))
      LinkGraph.triangles(ring.union(hubE).union(jump), nodes)
        .select(col("node"), col("degree"), col("n_tri"))
    }),

    // ---- 3-core membership (LinkGraph.kCore) over the SAME synthetic
    // link graph — iterative degree-< k peeling to the UNIQUE fixpoint
    // (order-independent, so no tie-break machinery); the ring
    // scaffolding peels away in cascades while the hub-dense center
    // survives. Engine iterates to convergence with a per-round probe;
    // the oracle unrolls 12 peeling rounds (equality requires the
    // fixpoint within 12 — the three-scale compare enforces it).
    "w_kcore" -> ((s, dir) => {
      import graft.web.LinkGraph
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val n = docs.count()
      val m = n / 5 // dense block: the first 20% interlinked at radius 3
      val d = col("doc_id")
      val ring = docs.select(d.as("src"), pmod(d + 1, lit(n)).as("dst"))
      val hubE = docs.filter(pmod(d, lit(3)) === 1)
        .select(d.as("src"), lit(0L).as("dst"))
      val jump = docs.filter(pmod(d, lit(5)) === 2)
        .select(d.as("src"), pmod(d * 7 + 3, lit(n)).as("dst"))
      val block = (1 to 3).map { r =>
        docs.filter(d < m)
          .select(d.as("src"), pmod(d + r, lit(m)).as("dst"))
      }.reduce(_ union _)
      val nodes = docs.select(d.as("node"))
      LinkGraph.kCore(
        ring.union(hubE).union(jump).union(block), nodes, k = 3)
        .select(col("node"), col("in_kcore"))
    }),

    // ---- canonical selection inside near-dup clusters — the decision
    // step every dedup pipeline ends with: simhash near-dup pairs →
    // connected components (transitive closure) → keep the LONGEST
    // member per cluster (chars DESC, doc_id ASC tie-break; "keep the
    // longest version" is the standard web-dedup rule — truncated
    // mirrors lose to their originals). Singletons are their own
    // canonical. One min(struct) per cluster — map-side combined,
    // no window, no sort of the full table; the oracle replays with
    // a recursive CTE + window.
    "w_canonical" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = Dedup.simhashPairs(docs, "doc_id", "text",
        maxHamming = 3, chunks = 4)
      val comp = Dedup.connectedComponents(pairs)
      val base = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"))
      val withComp = base.join(comp, base("doc_id") === comp("id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"),
          col("n_chars"))
      val canon = withComp.groupBy("component")
        .agg(min(struct((-col("n_chars")).as("neg"),
          col("doc_id").as("d"))).as("m"))
        .select(col("component"), col("m.d").as("canonical_id"))
      withComp.join(canon, "component")
        .select(col("doc_id"), col("component"), col("n_chars"),
          col("canonical_id"),
          (col("doc_id") === col("canonical_id")).as("keep"))
    }),

    // ---- inverted-index construction (the search artifact a crawl
    // feeds): per-term document frequency, collection frequency, and
    // the top-3 postings by term frequency via the bounded-heap TopK
    // aggregator — k rows per term per partition cross the wire,
    // never a full posting list (the w_frontier/q_topk skew valve).
    // Two map-side-combined shuffles total: (tok, doc) tf, then the
    // per-term rollup; tf desc + doc_id asc is the deterministic
    // posting order.
    "w_index" -> ((s, dir) => {
      import graft.functions.TopK
      val top3 = udaf(new TopK.TopKAgg(3))
      t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .groupBy(col("tok")).agg(
          count(lit(1)).as("df"),
          sum(col("tf")).as("cf"),
          top3(col("tf"), col("doc_id")).as("__t"))
        .select(col("tok"), col("df"), col("cf"),
          posexplode(col("__t").getField("items")))
        .select(col("tok"), col("df"), col("cf"),
          (col("pos") + 1).as("rank"),
          col("col").getField("id").as("doc_id"),
          col("col").getField("v").as("tf"))
    }),

    // ---- BM25 ranked retrieval (Robertson/Sparck Jones, k1=1.2,
    // b=0.75) for a 3-term query over the same index shape: corpus
    // stats are ONE 1-row broadcast, the term df dimension broadcasts,
    // postings score map-only, and the bounded-heap TopK keeps 8 docs
    // per term. Scores travel as BIGINT 1e-4 units (round-to-nearest)
    // so heap order and the oracle's window replay agree exactly; ln
    // enters under the same round()-pinned discipline as the PSI/JS
    // drift oracles. Operand order in the score expression mirrors
    // the oracle SQL token-for-token (double addition is
    // non-associative).
    "w_bm25" -> ((s, dir) => {
      import graft.functions.TopK
      val top8 = udaf(new TopK.TopKAgg(8))
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        sum(col("dl")).as("sum_dl"))
      val tf = toks.filter(col("tok").isin("spark", "join", "window"))
        .groupBy("tok", "doc_id").agg(count(lit(1)).as("tf"))
      val dft = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dft), "tok")
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf", log(
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
            + lit(1.0)))
        .withColumn("avgdl",
          col("sum_dl").cast("double") / col("n_docs").cast("double"))
        .withColumn("score_fp", round(
          col("idf") * (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) * (lit(0.25) +
              lit(0.75) * col("dl").cast("double") / col("avgdl")))
            * lit(10000), 0).cast("long"))
        .groupBy("tok")
        .agg(top8(col("score_fp"), col("doc_id")).as("__t"))
        .select(col("tok"), posexplode(col("__t").getField("items")))
        .select(col("tok"), (col("pos") + 1).as("rank"),
          col("col").getField("id").as("doc_id"),
          col("col").getField("v").as("score_fp"))
    }),

    // ---- function/custom validators: AfterValidator transform, named
    // predicate (predicate_failed), pipeline in_ check (value_error) —
    // the reference's functional_validators.py surface, columnar
    "f_validator" -> ((s, dir) => {
      import graft.compile.Compiler
      val d = t(s, dir, "documents")
      val st = d.schema
      val after = FunctionAfterSpec(IntSpec(ge = Some(0)), _ * 2)
      val even = ChainSpec(Seq(IntSpec(),
        PredicateSpec(c => c % 2 === 0, "is_even")))
      val inChk = ChainSpec(Seq(StrSpec(),
        CheckSpec(c => c.isin("en", "de"), "in ['en', 'de']")))
      val cAfter = Compiler.compile(col("n_chars"), st("n_chars").dataType,
        array(lit("n_chars")), after, Mode.Lax)
      val cEven = Compiler.compile(col("doc_id"), st("doc_id").dataType,
        array(lit("doc_id")), even, Mode.Lax)
      val cIn = Compiler.compile(col("lang"), st("lang").dataType,
        array(lit("lang")), inChk, Mode.Lax)
      d.select(col("doc_id"),
        cAfter.value.as("doubled"),
        (size(cEven.violations) === 0).as("even_ok"),
        (size(cIn.violations) === 0).as("in_ok"),
        try_element_at(cIn.violations, lit(1)).getField("type").as("in_vtype"))
    }),

    // ---- tuple: positional heterogeneous validation over an array —
    // ge/enum/le per position plus a missing violation when the tuple is
    // truncated (doc_id % 7 == 0 drops position 2)
    // ---- named-tuple: positional binding over an array column — short
    // rows (doc_id%7=0) exercise default + missing, long rows (doc_id%11=0)
    // the single too_long that replaces field errors (named_tuple.rs:367)
    "q_named_tuple" -> ((s, dir) => {
      import graft.compile.Compiler
      import org.apache.spark.sql.types.{ArrayType, StringType}
      val d = t(s, dir, "documents")
      val arr = array(col("doc_id").cast("string"), col("lang"),
        col("n_chars").cast("string"))
      val tup = when(pmod(col("doc_id"), lit(7)) === 0, slice(arr, 1, 1))
        .otherwise(when(pmod(col("doc_id"), lit(11)) === 0,
          concat(arr, array(lit("9")))).otherwise(arr))
      val spec = NamedTupleSpec("Doc", Seq(
        FieldSpec("x", IntSpec(ge = Some(0))),
        FieldSpec("y", WithDefaultSpec(EnumSpec(Seq("en", "de", "fr")),
          default = "en")),
        FieldSpec("z", IntSpec(le = Some(1000)))))
      val c = Compiler.compile(tup, ArrayType(StringType), array(lit("nt")),
        spec, Mode.Lax)
      d.select(col("doc_id"),
        size(c.violations).as("n_viol"),
        try_element_at(c.violations, lit(1)).getField("type").as("vtype"))
    }),

    "q_tuple" -> ((s, dir) => {
      import graft.compile.Compiler
      import org.apache.spark.sql.types.{ArrayType, StringType}
      val d = t(s, dir, "documents")
      val arr = array(col("doc_id").cast("string"), col("lang"),
        col("n_chars").cast("string"))
      val tup = when(pmod(col("doc_id"), lit(7)) === 0, slice(arr, 1, 2))
        .otherwise(arr)
      val spec = TupleSpec(Seq(
        IntSpec(ge = Some(0)),
        EnumSpec(Seq("en", "de", "fr")),
        IntSpec(le = Some(1000))))
      val c = Compiler.compile(tup, ArrayType(StringType), array(lit("tup")),
        spec, Mode.Lax)
      d.select(col("doc_id"),
        size(c.violations).as("n_viol"),
        try_element_at(c.violations, lit(1)).getField("type").as("vtype"))
    }),

    // Post-variadic tuple suffix (tuple[int, *tuple[str, ...], int, bool],
    // reference tuple.rs:122-210): branches exercise zero / one / two
    // variadic matches plus absent suffix positions, so the oracle pins
    // the suffix binding AND the reference's lagged error locs.
    "q_tuple_var" -> ((s, dir) => {
      import graft.compile.Compiler
      import org.apache.spark.sql.types.{ArrayType, StringType}
      val d = t(s, dir, "documents")
      val ds = col("doc_id").cast("string")
      val nstr = col("n_chars").cast("string")
      val bstr = when(pmod(col("doc_id"), lit(2)) === 0, lit("true"))
        .otherwise(lit("no"))
      val b = pmod(col("doc_id"), lit(4))
      val tup = when(b === 0, array(ds))
        .when(b === 1, array(ds, nstr, bstr))
        .when(b === 2, array(ds, col("lang"), nstr, bstr))
        .otherwise(array(ds, col("lang"), col("lang"), nstr, lit("x")))
      val spec = TupleSpec(Seq(IntSpec(ge = Some(0))),
        variadic = Some(StrSpec()),
        suffix = Seq(IntSpec(le = Some(1000)), BoolSpec()))
      val c = Compiler.compile(tup, ArrayType(StringType),
        array(lit("tv")), spec, Mode.Lax)
      // same two-projection split as q_fraction/q_complex: the compiled
      // violations tree is referenced 4 ways below — staged once so the
      // optimizer plans ONE copy (measured ~1.6s of pure planning time
      // on the 4-copy form at sf0.1, ~0.4s split)
      d.select(col("doc_id"), c.value.as("__tv"), c.violations.as("__vs"))
        .select(col("doc_id"),
          size(col("__vs")).as("n_viol"),
          try_element_at(col("__vs"), lit(1)).getField("type").as("vtype"),
          try_element_at(try_element_at(col("__vs"), lit(1)).getField("loc"),
            lit(2)).cast("int").as("vloc"),
          col("__tv").getField("_2").as("v2"))
    }),

    // ---- north-star composite model: the reference's own flagship
    // benchmark shape — UUID/decimal/date/time/datetime + a list of
    // two-level discriminated unions, validated from lax strings. The
    // generated input is ALSO written to a fixed path so the DuckDB oracle
    // can replay the validation over the exact same rows.
    "ns_verdict" -> ((s, dir) => {
      val df = ensureFixedInput(s, nsInputPath)(
        graft.data.NorthStar.generate(s, 5000L))
      // planAuto -> exploded scale path for websites; the oracle's exact
      // n_viol equality now gates the EXPLODED path, not just the inline one
      ModelValidator.planAuto(df, graft.data.NorthStar.personSpec, "row_id")
        .select(col("row_id"),
          size(col(ModelValidator.VIOLATIONS)).as("n_viol"),
          col(ModelValidator.VALID).as("valid"))
    })
  )

  /** Where ns_verdict persists its generated input for the oracle. */
  private val nsInputPath = "/tmp/graft_ns_input_v1"

  /** Scale knob for the generated code-family inputs (round-5 scale
   * proof): row count of the code/notebook/fork tables. Default 2000 is
   * the driver gate's fixed input; the 10x/100x proofs run Verify with
   * `SPARK_GRAFT_CODE_N=20000 / 200000` — every pathology in
   * [[SourceFilesGen]] is a fixed-probability hash slice and near-dup
   * truth is 97-id-block-local, so RATES are scale-constant by
   * construction (the generator-level equivalent of the document mirror's
   * token bijection). The n-suffixed path flows into the oracle SQL via
   * interpolation, so the same DuckDB compare replays at any scale. */
  private val codeN: Long =
    sys.env.get("SPARK_GRAFT_CODE_N").map(_.toLong).getOrElse(2000L)

  /** Repo counts scale WITH n (more repos, same per-repo shape — the
   * web-scale growth axis; keeps every per-repo statistic and the fork
   * containment floors scale-constant). */
  private def scaledRepos(base: Int): Int =
    math.max(base, (base * (codeN.toDouble / 2000.0)).toInt)

  private val codeNSuffix = if (codeN == 2000L) "" else s"_n$codeN"

  /** Where c_quality/c_filter persist the pathology-enabled code table for
   * the oracle (fixed path: the oracle SQL string embeds it, same contract
   * as [[nsInputPath]]). The `_v1` suffix versions the GENERATOR: bump it
   * whenever [[SourceFilesGen]] output changes, so stale dirs from older
   * generators are never read (the suffix flows into every oracle SQL via
   * interpolation). */
  private val codeInputPath = s"/tmp/graft_code_input_v1$codeNSuffix"

  /** Materialize a deterministic generated table at a fixed path exactly
   * once, concurrency-safe across PROCESSES: generate into a private temp
   * dir and atomically rename into place, so readers only ever see a
   * complete dir. Two concurrent processes may both generate; the rename
   * loser deletes its temp copy (same deterministic bytes). This replaces
   * the per-JVM AtomicBoolean guard, which raced an overwrite in one
   * process against a read in another (FAILED_READ_FILE). */
  private def ensureFixedInput(s: SparkSession, path: String)
                              (gen: => DataFrame): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val target = Paths.get(path)
    if (!Files.exists(target)) {
      val tmp = Paths.get(path + "_tmp_" + s.sparkContext.applicationId)
      gen.write.mode("overwrite").parquet(tmp.toString)
      try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException =>
          // another process won the rename between our exists-check and
          // move — its dir holds the identical deterministic bytes
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    s.read.parquet(path)
  }

  private def codeInput(s: SparkSession): DataFrame =
    ensureFixedInput(s, codeInputPath)(
      SourceFilesGen.generate(s, codeN, repoCount = scaledRepos(1000),
        codePathologies = true))

  /** Where c_notebook persists its generated ipynb table for the oracle
   * (same contract as [[codeInputPath]]). */
  private val nbInputPath = s"/tmp/graft_nb_input_v1$codeNSuffix"
  private def nbInput(s: SparkSession): DataFrame =
    ensureFixedInput(s, nbInputPath)(SourceFilesGen.notebooks(s, codeN))

  /** Where c_forks persists its fork-pathology table for the oracle (same
   * contract as [[codeInputPath]]; separate table so the other c_* oracles
   * keep their 2000-row input untouched). Fewer, larger repos
   * (repoCount=150, ~11 files each + the mega-repo) so containment over a
   * fork's file set clears the minShared floor. */
  private val forkInputPath = s"/tmp/graft_fork_input_v1$codeNSuffix"
  private def forkInput(s: SparkSession): DataFrame =
    ensureFixedInput(s, forkInputPath)(
      SourceFilesGen.withForks(
        SourceFilesGen.generate(s, codeN, repoCount = scaledRepos(150),
          codePathologies = true)))

  /** Shared DuckDB replay of [[CodeOps.codeQuality]] over the persisted
   * code-input table — `q(id, lang, n_lines, max_line_len, sum_line_len,
   * mean_line_len, n_comment_lines, comment_frac, alnum_frac, autogen)`.
   * Every fraction is one long/long division (bit-exact vs Spark);
   * `string_split` keeps the trailing empty element exactly like Java
   * `split(_, -1)`, so line counts agree on newline-terminated files. */
  private val codeQualityCteSql =
    s"""b AS (SELECT id, lang,
       |  (length(content) - length(regexp_replace(content, '[A-Za-z0-9]', '', 'g')))
       |    / nullif(length(content), 0) AS alnum_frac,
       |  regexp_matches(substring(content, 1, 200),
       |    '${graft.text.CodeOps.autogenPattern}') AS autogen,
       |  CASE WHEN lang IN ('python', 'ruby') THEN '#' ELSE '//' END AS pfx,
       |  unnest(string_split(content, chr(10))) AS line
       | FROM read_parquet('$codeInputPath/*.parquet')),
       |q AS (SELECT id, lang, count(*) AS n_lines,
       |  CAST(max(length(line)) AS BIGINT) AS max_line_len,
       |  CAST(sum(length(line)) AS BIGINT) AS sum_line_len,
       |  CAST(sum(length(line)) AS BIGINT) / count(*) AS mean_line_len,
       |  CAST(sum(CASE WHEN starts_with(ltrim(line), pfx) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_comment_lines,
       |  CAST(sum(CASE WHEN starts_with(ltrim(line), pfx) THEN 1 ELSE 0 END)
       |    AS BIGINT) / count(*) AS comment_frac,
       |  alnum_frac, autogen
       | FROM b GROUP BY id, lang, alnum_frac, autogen, pfx)""".stripMargin

  /** (input, expected name, expected normalized email) — transcribed from
   * the reference's validate_email test table
   * (`tests/test_networks.py:905-976`; nulls = the reject rows),
   * INCLUDING the punycode-decoding fixture (`foobar@xn--80ak6aa92e.com`
   * -> `foobar@аррӏе.com`, [[graft.functions.EmailNorm]]). */
  /** IP fixture table: (input, IPvAnyAddress str, IPvAnyInterface str,
   * IPvAnyNetwork str); nulls = the ValueError rows. Goldens generated
   * with CPython `ipaddress` — the exact implementation
   * `pydantic/networks.py:1159-1302` delegates to — covering octet
   * leading-zero rejection, RFC-5952 compression (incl. the
   * single-zero-hextet no-compress case), embedded IPv4, `%scope`,
   * netmask/hostmask prefixes (v4 only), leading-zero prefixes, and the
   * strict host-bits-set network rejection. */
  private[graft] val ipFixtures: Seq[(String, String, String, String)] = Seq(
    ("127.0.0.1", "127.0.0.1", "127.0.0.1/32", "127.0.0.1/32"),
    ("0.0.0.0", "0.0.0.0", "0.0.0.0/32", "0.0.0.0/32"),
    ("255.255.255.255", "255.255.255.255", "255.255.255.255/32",
      "255.255.255.255/32"),
    ("192.168.1.1", "192.168.1.1", "192.168.1.1/32", "192.168.1.1/32"),
    ("1.2.3.4", "1.2.3.4", "1.2.3.4/32", "1.2.3.4/32"),
    ("256.1.1.1", null, null, null),
    ("1.2.3", null, null, null),
    ("1.2.3.4.5", null, null, null),
    ("01.2.3.4", null, null, null),
    ("1.2.3.040", null, null, null),
    ("1.2.3.4 ", null, null, null),
    (" 1.2.3.4", null, null, null),
    ("1.2.3.-4", null, null, null),
    ("1.2.3.+4", null, null, null),
    ("1.2.3.4\n", null, null, null),
    ("", null, null, null),
    (".", null, null, null),
    ("1..2.3", null, null, null),
    ("0x7f.0.0.1", null, null, null),
    ("999.999.999.999", null, null, null),
    ("1.2.3.255", "1.2.3.255", "1.2.3.255/32", "1.2.3.255/32"),
    ("10.020.3.4", null, null, null),
    ("::", "::", "::/128", "::/128"),
    ("::1", "::1", "::1/128", "::1/128"),
    ("2001:db8::1", "2001:db8::1", "2001:db8::1/128", "2001:db8::1/128"),
    ("2001:0db8:0000:0000:0000:ff00:0042:8329", "2001:db8::ff00:42:8329",
      "2001:db8::ff00:42:8329/128", "2001:db8::ff00:42:8329/128"),
    ("2001:DB8::FF00:42:8329", "2001:db8::ff00:42:8329",
      "2001:db8::ff00:42:8329/128", "2001:db8::ff00:42:8329/128"),
    ("fe80::1%eth0", "fe80::1%eth0", "fe80::1%eth0/128", "fe80::1%eth0/128"),
    ("fe80::1%", null, null, null),
    ("fe80::1%e%h", null, null, null),
    ("::ffff:192.168.1.1", "::ffff:c0a8:101", "::ffff:c0a8:101/128",
      "::ffff:c0a8:101/128"),
    ("::ffff:192.168.1.256", null, null, null),
    ("1:2:3:4:5:6:7:8", "1:2:3:4:5:6:7:8", "1:2:3:4:5:6:7:8/128",
      "1:2:3:4:5:6:7:8/128"),
    ("1:2:3:4:5:6:7:8:9", null, null, null),
    ("1:2:3:4:5:6:7", null, null, null),
    ("1::2::3", null, null, null),
    (":::", null, null, null),
    ("1:2:3:4:5:6:7::", "1:2:3:4:5:6:7:0", "1:2:3:4:5:6:7:0/128",
      "1:2:3:4:5:6:7:0/128"),
    ("::1:2:3:4:5:6:7", "0:1:2:3:4:5:6:7", "0:1:2:3:4:5:6:7/128",
      "0:1:2:3:4:5:6:7/128"),
    ("1::", "1::", "1::/128", "1::/128"),
    ("::ffff:1.2.3.4", "::ffff:102:304", "::ffff:102:304/128",
      "::ffff:102:304/128"),
    ("12345::", null, null, null),
    ("1:2:3:4:5:6:1.2.3.4", "1:2:3:4:5:6:102:304",
      "1:2:3:4:5:6:102:304/128", "1:2:3:4:5:6:102:304/128"),
    ("g::1", null, null, null),
    ("0:0:0:0:0:0:0:0", "::", "::/128", "::/128"),
    ("2001:db8:0:0:1:0:0:1", "2001:db8::1:0:0:1", "2001:db8::1:0:0:1/128",
      "2001:db8::1:0:0:1/128"),
    ("1:0:0:2:0:0:0:3", "1:0:0:2::3", "1:0:0:2::3/128", "1:0:0:2::3/128"),
    ("::%scope", "::%scope", "::%scope/128", "::%scope/128"),
    ("1:2::8%x", "1:2::8%x", "1:2::8%x/128", "1:2::8%x/128"),
    ("1.2.3.4/24", null, "1.2.3.4/24", null),
    ("1.2.3.4/32", null, "1.2.3.4/32", "1.2.3.4/32"),
    ("1.2.3.4/0", null, "1.2.3.4/0", null),
    ("1.2.3.4/33", null, null, null),
    ("1.2.3.4/024", null, "1.2.3.4/24", null),
    ("1.2.3.4/+24", null, null, null),
    ("1.2.3.4/-1", null, null, null),
    ("1.2.3.4//24", null, null, null),
    ("1.2.3.4/24/8", null, null, null),
    ("1.2.3.0/255.255.255.0", null, "1.2.3.0/24", "1.2.3.0/24"),
    ("1.2.3.0/0.0.0.255", null, "1.2.3.0/24", "1.2.3.0/24"),
    ("1.2.3.0/255.0.255.0", null, null, null),
    ("1.2.3.0/24", null, "1.2.3.0/24", "1.2.3.0/24"),
    ("10.0.0.0/8", null, "10.0.0.0/8", "10.0.0.0/8"),
    ("2001:db8::/32", null, "2001:db8::/32", "2001:db8::/32"),
    ("2001:db8::1/64", null, "2001:db8::1/64", null),
    ("::/0", null, "::/0", "::/0"),
    ("2001:db8::/129", null, null, null),
    ("2001:db8::/ffff:ffff::", null, null, null),
    ("fe80::1%eth0/64", null, "fe80::1%eth0/64", null),
    ("1.2.3.4/255.255.255.255", null, "1.2.3.4/32", "1.2.3.4/32"))

  private[graft] val emailFixtures: Seq[(String, String, String)] = Seq(
    ("foobar@xn--80ak6aa92e.com", "foobar", "foobar@аррӏе.com"),
    ("foobar@example.com", "foobar", "foobar@example.com"),
    ("s@muelcolvin.com", "s", "s@muelcolvin.com"),
    ("Samuel Colvin <s@muelcolvin.com>", "Samuel Colvin", "s@muelcolvin.com"),
    ("foobar <foobar@example.com>", "foobar", "foobar@example.com"),
    (" foo.bar@example.com", "foo.bar", "foo.bar@example.com"),
    ("foo.bar@example.com ", "foo.bar", "foo.bar@example.com"),
    ("foo BAR <foobar@example.com >", "foo BAR", "foobar@example.com"),
    ("FOO bar   <foobar@example.com> ", "FOO bar", "foobar@example.com"),
    (" Whatever <foobar@example.com>", "Whatever", "foobar@example.com"),
    ("Whatever < foobar@example.com>", "Whatever", "foobar@example.com"),
    ("Whatever <foobar@example.com >", "Whatever", "foobar@example.com"),
    ("Whatever < foobar@example.com >", "Whatever", "foobar@example.com"),
    ("<FOOBAR@example.com> ", "FOOBAR", "FOOBAR@example.com"),
    ("ñoñó@example.com", "ñoñó", "ñoñó@example.com"),
    ("我買@example.com", "我買", "我買@example.com"),
    ("甲斐黒川日本@example.com", "甲斐黒川日本", "甲斐黒川日本@example.com"),
    ("чебурашкаящик-с-апельсинами.рф@example.com",
      "чебурашкаящик-с-апельсинами.рф",
      "чебурашкаящик-с-апельсинами.рф@example.com"),
    ("उदाहरण.परीक्ष@domain.with.idn.tld", "उदाहरण.परीक्ष",
      "उदाहरण.परीक्ष@domain.with.idn.tld"),
    ("foo.bar@exam-ple.com ", "foo.bar", "foo.bar@exam-ple.com"),
    ("ιωάννης@εεττ.gr", "ιωάννης", "ιωάννης@εεττ.gr"),
    ("foobar@аррӏе.com", "foobar", "foobar@аррӏе.com"),
    ("аррӏе@example.com", "аррӏе", "аррӏе@example.com"),
    ("xn--80ak6aa92e@example.com", "xn--80ak6aa92e",
      "xn--80ak6aa92e@example.com"),
    ("葉士豪@臺網中心.tw", "葉士豪", "葉士豪@臺網中心.tw"),
    ("\"first.last\" <first.last@example.com>", "first.last",
      "first.last@example.com"),
    ("first.last <first.last@example.com>", "first.last",
      "first.last@example.com"),
    ("Shaquille O'Neal <shaq@example.com>", "Shaquille O'Neal",
      "shaq@example.com"),
    ("Homer J. Simpson <homer@thesimpsons.com>", "Homer J. Simpson",
      "homer@thesimpsons.com"),
    // UTS-46 deviation rows (round 5; goldens from python idna,
    // non-transitional — the exact library email-validator v2 wraps):
    // ß survives (IDNA2003 mapped it to ss), ACE labels decoding TO a
    // deviation char decode (IDNA2003's round-trip check kept them
    // ascii), uppercase final Σ maps context-free to σ (not ς), typed
    // final ς is kept
    ("x@straße.com", "x", "x@straße.com"),
    ("x@STRAẞE.com", "x", "x@straße.com"),
    ("x@xn--strae-oqa.com", "x", "x@straße.com"),
    ("x@ΒΌΛΟΣ.com", "x", "x@βόλοσ.com"),
    ("x@βόλος.com", "x", "x@βόλος.com"),
    ("x@xn--nxasmq6b.com", "x", "x@βόλοσ.com"),
    // reject rows
    ("@example.com", null, null),
    ("f oo.bar@example.com", null, null),
    ("foobar", null, null),
    ("foobar@localhost", null, null),
    ("foobar@127.0.0.1", null, null),
    ("foo.bar@exam\nple.com ", null, null),
    ("foobar <foobar@example.com", null, null),
    ("foobar@.example.com", null, null),
    ("foobar@.com", null, null),
    ("foo bar@example.com", null, null),
    ("foo@bar@example.com", null, null),
    ("\n@example.com", null, null),
    (" @example.com", null, null),
    ("\"@example.com", null, null),
    (",@example.com", null, null),
    ("foobar <foobar<@example.com>", null, null),
    ("foobar <foobar@example.com>>", null, null),
    ("foobar <<foobar<@example.com>", null, null),
    ("foobar <>", null, null))

  /** Similarity tuning shared between the Spark queries and the oracle
   * SQL: target bucket loads and the degenerate-bucket guard. */
  private val ndTargetLoad = 8.0
  private val annTargetLoad = 32.0
  private val simMaxBucket = 1000L
  private val ivfCells = 8
  private val ivfNprobe = 2

  // ---- shared DuckDB fragments (each replays the engine's exact
  // arithmetic: in-order double folds, md5-derived hashes)

  /** In-order-fold dot product over two pre-normalized list<double> exprs —
   * bit-identical to [[Similarity.dot]] over [[Similarity.withNormalized]]
   * columns (same casts, same fold order). */
  private def ndotSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1,64), i -> $a[i] * $b[i]), (u,w) -> u + w)"

  /** In-order-fold squared L2 distance between a raw float vector and a
   * double centroid list — bit-identical to [[Similarity.ivfAssign]]'s
   * per-dim `(element_at(vec,i+1).cast(double) - lit(cv))²` left fold. */
  private def ivfD2Sql(vec: String, cv: String): String =
    s"list_reduce(list_transform(generate_series(1,64), i -> " +
      s"(CAST($vec[i] AS DOUBLE) - $cv[i]) * (CAST($vec[i] AS DOUBLE) - $cv[i])), (u,w) -> u + w)"

  /** CTEs `nrm`/`nv`: vec_id -> pre-normalized embedding as list<double>,
   * replaying [[Similarity.withNormalized]] bit-for-bit (norm = sqrt of the
   * in-order self-dot; each component divided by it once). */
  private val normCteSql =
    """nrm AS (SELECT vec_id, sqrt(list_reduce(list_transform(generate_series(1,64),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (u,w) -> u + w)) AS nm
      |  FROM embeddings),
      |nv AS (SELECT e.vec_id, list_transform(generate_series(1,64),
      |    i -> CAST(e.embedding[i] AS DOUBLE) / r.nm) AS v
      |  FROM embeddings e JOIN nrm r USING (vec_id))""".stripMargin

  /** CTEs `np` (corpus-scaled plane count — the formula in
   * [[Similarity.planesForCount]]), `pl` (md5-derived hyperplanes, the same
   * integers [[Similarity.portablePlanes]] emits) and `bk` (vec_id -> LSH
   * bucket over the RAW embedding, matching [[Similarity.lshBucket]]). */
  private def autoBucketCteSql(targetLoad: Double): String =
    s"""np AS (SELECT CAST(greatest(4, least(30,
       |    ceil(log2((count(*) + 0.5) / $targetLoad)))) AS INT) AS n FROM embeddings),
       |pl AS (SELECT p, list_transform(generate_series(1, 64),
       |    d -> CAST(concat('0x', substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000) AS pv
       |  FROM (SELECT unnest(generate_series(0, (SELECT n FROM np) - 1)) AS p)),
       |bk AS (SELECT vec_id, CAST(sum(CASE WHEN
       |    list_reduce(list_transform(generate_series(1,64), i -> CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)), (u,w) -> u + w) > 0
       |  THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM embeddings CROSS JOIN pl GROUP BY vec_id)""".stripMargin

  /** CTEs tk (tokens) and s (distinct 3-gram shingles) over documents. */
  // ---- partial-JSON oracle scaffolding: a fixed-layout template truncated
  // at every position; the (position -> cut, completion-tail) table is
  // computed once here by running the engine's own scanner on the template
  // (digit values can vary per doc — the STRUCTURE, and with it cut/tail,
  // cannot). Reference fidelity is pinned separately by JsonPartialSpec's
  // pydantic_core golden fixtures; this oracle pins the Spark execution.
  private[graft] val jpTemplate =
    """{"k": 123, "tags": ["alpha", "beta"], "note": "text"}"""
  private def jpComplete(prefix: String, ts: Boolean): Option[String] =
    Option(graft.functions.JsonPartial.complete(
      org.apache.spark.unsafe.types.UTF8String.fromString(prefix), ts))
      .map(_.toString)
  private[graft] val jpLookup: Seq[(Int, Option[(Int, String)], Option[(Int, String)])] =
    (1 to jpTemplate.length).map { p =>
      val c = jpTemplate.substring(0, p)
      def cutTail(out: Option[String]): Option[(Int, String)] = out.map { o =>
        val cut = (0 to math.min(c.length, o.length))
          .findLast(k => o.startsWith(c.substring(0, k))).getOrElse(0)
        (cut, o.substring(cut))
      }
      (p, cutTail(jpComplete(c, ts = false)), cutTail(jpComplete(c, ts = true)))
    }

  private val shinglesCteSql =
    """tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') tk FROM documents),
      |s AS (SELECT doc_id, list_distinct(list_transform(
      |  generate_series(1, greatest(len(tk) - 2, 1)),
      |  i -> array_to_string(tk[i:i+2], ' '))) sh FROM tk)""".stripMargin

  /** CTEs computing the 60-bit simhash per doc (identical to
   * [[Dedup.simhash]]: md5-60bit token hash, ±1 bit votes). */
  private val simhashCteSql =
    """tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') tk FROM documents),
      |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(t.tok),1,15)) AS BIGINT) h
      |      FROM tk, unnest(tk.tk) AS t(tok)),
      |bits AS (SELECT doc_id, g.i, sum(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) v
      |         FROM h CROSS JOIN (SELECT unnest(generate_series(0,59)) i) g GROUP BY 1, 2),
      |sig AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) sig
      |        FROM bits GROUP BY doc_id)""".stripMargin

  private def langScoreSql(words: Seq[String]): String =
    s"len(list_filter(tk, t -> t IN (${words.map("'" + _ + "'").mkString(",")}))) * 1.0 / len(tk)"

  /** The doc-model violation replay, templated over a source relation so
   * the regression diff can run it against two snapshots. */
  private def docViolationsSql(src: String): String =
    s"""SELECT doc_id, 'doc_id' AS field, 'missing' AS vtype FROM $src WHERE doc_id IS NULL
       |UNION ALL SELECT doc_id, 'doc_id', 'greater_than_equal' FROM $src WHERE doc_id < 0
       |UNION ALL SELECT doc_id, 'text', 'missing' FROM $src WHERE text IS NULL
       |UNION ALL SELECT doc_id, 'text', 'string_too_short' FROM $src WHERE length(text) < 100
       |UNION ALL SELECT doc_id, 'text', 'string_too_long' FROM $src WHERE length(text) > 500
       |UNION ALL SELECT doc_id, 'lang', 'missing' FROM $src WHERE lang IS NULL
       |UNION ALL SELECT doc_id, 'lang', 'enum' FROM $src WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr')
       |UNION ALL SELECT doc_id, 'source', 'missing' FROM $src WHERE source IS NULL
       |UNION ALL SELECT doc_id, 'source', 'string_pattern_mismatch' FROM $src WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$$')
       |UNION ALL SELECT doc_id, 'n_chars', 'missing' FROM $src WHERE n_chars IS NULL
       |UNION ALL SELECT doc_id, 'n_chars', 'greater_than_equal' FROM $src WHERE n_chars < 1
       |UNION ALL SELECT doc_id, 'n_chars', 'less_than_equal' FROM $src WHERE n_chars > 1000""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "f_validator" ->
      """SELECT doc_id,
        |  n_chars * 2 AS doubled,
        |  doc_id IS NULL OR doc_id % 2 = 0 AS even_ok,
        |  lang IS NULL OR lang IN ('en', 'de') AS in_ok,
        |  CASE WHEN lang IS NOT NULL AND lang NOT IN ('en', 'de')
        |       THEN 'value_error' END AS in_vtype
        |FROM documents""".stripMargin,

    // The only checks the generator can trip are: uuid shape on id, blog
    // avg_post_rating le 5, profile username min length, linkedin
    // connections le 500 — every other generated value is valid by
    // construction, and the oracle's exact n_viol/valid equality asserts
    // the engine emits NOTHING else (a spurious violation anywhere in the
    // two-level union breaks the match).
    "ns_verdict" ->
      s"""WITH p AS (SELECT * FROM read_parquet('$nsInputPath/*.parquet')),
         |v AS (SELECT row_id,
         |  CAST(CASE WHEN NOT regexp_matches(id,
         |      '^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$$') THEN 1 ELSE 0 END
         |  + len(list_filter(websites, w -> struct_extract(w, 'type') = 'blog'
         |      AND CAST(struct_extract(w, 'avg_post_rating') AS DOUBLE) > 5.0))
         |  + len(list_filter(websites, w -> struct_extract(w, 'type') = 'profile'
         |      AND length(struct_extract(w, 'username')) < 1))
         |  + len(list_filter(websites, w -> struct_extract(w, 'type') = 'profile'
         |      AND struct_extract(w, 'network') = 'linkedin'
         |      AND CAST(struct_extract(w, 'connections') AS BIGINT) > 500)) AS INT) AS n_viol
         | FROM p)
         |SELECT row_id, n_viol, n_viol = 0 AS valid FROM v""".stripMargin,

    // the synthetic generator is pure integer arithmetic over id — the
    // oracle recomputes byte sizes and kinds from the same formulas
    "m_media_stats" ->
      """WITH m AS (SELECT
        |    CASE CAST(id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |         ELSE 'video' END AS kind,
        |    64 + (id * 2654435761) % 4096 AS len
        |  FROM generate_series(0, 599) t(id))
        |SELECT kind, count(*) AS n, CAST(sum(len) AS BIGINT) AS total_bytes,
        |  count(CASE WHEN kind = 'video' THEN 1 END) AS with_frames
        |FROM m GROUP BY kind""".stripMargin,

    "q_named_tuple" ->
      """SELECT doc_id,
        |  CAST(CASE
        |    WHEN doc_id % 7 = 0 THEN (CASE WHEN doc_id < 0 THEN 1 ELSE 0 END) + 1
        |    WHEN doc_id % 11 = 0 THEN 1
        |    ELSE (CASE WHEN doc_id < 0 THEN 1 ELSE 0 END)
        |       + (CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','de','fr') THEN 1 ELSE 0 END)
        |       + (CASE WHEN n_chars > 1000 THEN 1 ELSE 0 END) END AS INT) AS n_viol,
        |  CASE
        |    WHEN doc_id % 7 = 0 THEN (CASE WHEN doc_id < 0 THEN 'greater_than_equal' ELSE 'missing' END)
        |    WHEN doc_id % 11 = 0 THEN 'too_long'
        |    WHEN doc_id < 0 THEN 'greater_than_equal'
        |    WHEN lang IS NOT NULL AND lang NOT IN ('en','de','fr') THEN 'enum'
        |    WHEN n_chars > 1000 THEN 'less_than_equal'
        |  END AS vtype
        |FROM documents""".stripMargin,

    "q_tuple" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id < 0 THEN 1 ELSE 0 END
        |    + CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','de','fr') THEN 1 ELSE 0 END
        |    + CASE WHEN coalesce(doc_id % 7 = 0, FALSE) THEN 1
        |           WHEN n_chars > 1000 THEN 1 ELSE 0 END AS INT) AS n_viol,
        |  CASE WHEN doc_id < 0 THEN 'greater_than_equal'
        |       WHEN lang IS NOT NULL AND lang NOT IN ('en','de','fr') THEN 'enum'
        |       WHEN coalesce(doc_id % 7 = 0, FALSE) THEN 'missing'
        |       WHEN n_chars > 1000 THEN 'less_than_equal' END AS vtype
        |FROM documents""".stripMargin,

    // Replays the reference's post-variadic tuple semantics closed-form:
    // suffix claims the LAST two elements; error locs lag by one once the
    // variadic matched >= 1 element (tuple.rs:170-206), so the b=3 branch
    // (two variadic matches) reports locs 2/3 while b=1/2 report loc 1.
    "q_tuple_var" ->
      """SELECT doc_id,
        |  CAST((CASE WHEN doc_id < 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN doc_id % 4 = 0 THEN 2
        |            WHEN doc_id % 4 = 3 THEN
        |              (CASE WHEN n_chars > 1000 THEN 2 ELSE 1 END)
        |            ELSE (CASE WHEN n_chars > 1000 THEN 1 ELSE 0 END)
        |       END) AS INT) AS n_viol,
        |  CASE WHEN doc_id < 0 THEN 'greater_than_equal'
        |       WHEN doc_id % 4 = 0 THEN 'missing'
        |       WHEN n_chars > 1000 THEN 'less_than_equal'
        |       WHEN doc_id % 4 = 3 THEN 'bool_parsing' END AS vtype,
        |  CAST(CASE WHEN doc_id < 0 THEN 0
        |       WHEN doc_id % 4 = 0 THEN 1
        |       WHEN n_chars > 1000 AND doc_id % 4 IN (1, 2) THEN 1
        |       WHEN n_chars > 1000 AND doc_id % 4 = 3 THEN 2
        |       WHEN doc_id % 4 = 3 THEN 3 END AS INT) AS vloc,
        |  CAST(CASE WHEN doc_id % 4 <> 0 THEN n_chars END AS BIGINT) AS v2
        |FROM documents""".stripMargin,

    "p_dataset_card" ->
      """SELECT source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
        |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS n_de,
        |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS n_fr,
        |  (count(*) - count(DISTINCT sha256(text))) * 1.0 / count(*) AS dup_rate
        |FROM documents GROUP BY source""".stripMargin,

    // Replays repetitionMetrics: same tokenization (single-space split),
    // same bigram adjacency, integer counts, one IEEE division per
    // fraction -> hash-exact.
    "t_repetition" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |tok0 AS (SELECT doc_id, arr,
        |    unnest(generate_series(1, len(arr))) AS pos FROM tk),
        |tok AS (SELECT doc_id, arr[pos] AS tok,
        |    CASE WHEN pos + 1 <= len(arr)
        |         THEN arr[pos] || ' ' || arr[pos + 1] END AS bg
        |  FROM tok0),
        |base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct
        |  FROM tok GROUP BY doc_id),
        |bgc AS (SELECT doc_id, bg, count(*) AS c FROM tok
        |  WHERE bg IS NOT NULL GROUP BY doc_id, bg),
        |topb AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_c FROM bgc GROUP BY doc_id)
        |SELECT b.doc_id, b.n_tokens,
        |  (b.n_tokens - b.n_distinct) * 1.0 / b.n_tokens AS dup_token_frac,
        |  coalesce(t.top_c, 0) * 2.0 / b.n_tokens AS top_bigram_frac
        |FROM base b LEFT JOIN topb t USING (doc_id)""".stripMargin,

    "t_bpe_tokens" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents""".stripMargin,

    "t_decontam" ->
      s"""WITH $shinglesCteSql,
         |sr0 AS (SELECT doc_id, unnest(sh) AS shg FROM s),
         |sr AS (SELECT DISTINCT doc_id,
         |         CAST(concat('0x', substr(md5(shg), 1, 15)) AS BIGINT) AS h
         |       FROM sr0),
         |bset AS (SELECT DISTINCT h FROM sr WHERE doc_id % 97 = 0)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN h IN (SELECT h FROM bset) THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_hits,
         |  sum(CASE WHEN h IN (SELECT h FROM bset) THEN 1 ELSE 0 END) * 1.0
         |    / count(*) AS overlap_frac
         |FROM sr GROUP BY doc_id""".stripMargin,

    "t_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CASE lang
        |  WHEN 'en' THEN CAST(concat('0x',
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 2 < 1
        |  WHEN 'zh' THEN CAST(concat('0x',
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4 < 1
        |  ELSE TRUE END""".stripMargin,

    "c_quality" ->
      s"""WITH $codeQualityCteSql
         |SELECT id, lang, n_lines, max_line_len, sum_line_len, mean_line_len,
         |  n_comment_lines, comment_frac, alnum_frac, autogen
         |FROM q""".stripMargin,

    "c_filter" ->
      s"""WITH $codeQualityCteSql,
         |r AS (SELECT id, lang,
         |  CASE WHEN autogen THEN 'autogenerated'
         |       WHEN max_line_len > 1000 THEN 'long_line'
         |       WHEN mean_line_len > 100.0 THEN 'mean_line'
         |       WHEN alnum_frac < 0.25 THEN 'low_alnum' END AS reason
         | FROM q)
         |SELECT id, lang, reason IS NULL AS keep, reason FROM r""".stripMargin,

    "c_secrets" ->
      s"""SELECT id,
         |  CAST(len(regexp_extract_all(content, '${graft.text.CodeOps.SecretAwsRe}')) AS BIGINT) AS n_aws,
         |  CAST(len(regexp_extract_all(content, '${graft.text.CodeOps.SecretGithubRe}')) AS BIGINT) AS n_github,
         |  CAST(len(regexp_extract_all(content, '${graft.text.CodeOps.SecretPemRe}')) AS BIGINT) AS n_pem,
         |  sha256(regexp_replace(regexp_replace(regexp_replace(content,
         |    '${graft.text.CodeOps.SecretAwsRe}', '<SECRET>', 'g'),
         |    '${graft.text.CodeOps.SecretGithubRe}', '<SECRET>', 'g'),
         |    '${graft.text.CodeOps.SecretPemRe}', '<SECRET>', 'g')) AS redacted_sha
         |FROM read_parquet('$codeInputPath/*.parquet')""".stripMargin,

    "c_license" ->
      s"""WITH h AS (SELECT id, substring(content, 1, 400) AS head
         |  FROM read_parquet('$codeInputPath/*.parquet')),
         |l AS (SELECT id, CASE
         |  WHEN regexp_extract(head, '${graft.text.CodeOps.SpdxRe}', 1) <> ''
         |    THEN regexp_extract(head, '${graft.text.CodeOps.SpdxRe}', 1)
         |  WHEN contains(head, 'Permission is hereby granted, free of charge')
         |    THEN 'MIT'
         |  WHEN regexp_matches(head, 'Apache License,? Version 2\\.0')
         |    THEN 'Apache-2.0'
         |  WHEN contains(head, 'GNU General Public License') THEN 'GPL'
         |  WHEN contains(head, 'Redistribution and use in source and binary forms')
         |    THEN 'BSD'
         |  END AS license FROM h)
         |SELECT id, license,
         |  COALESCE(license IN ('MIT', 'Apache-2.0', 'BSD', 'BSD-2-Clause',
         |    'BSD-3-Clause', 'ISC', 'Unlicense'), false) AS permissive
         |FROM l""".stripMargin,

    // line-df replay on the 60-bit md5 line hash; one double division of
    // exact integers -> bit-exact fraction
    "c_boilerplate" ->
      s"""WITH l AS (SELECT id, unnest(list_distinct(
         |      string_split(content, chr(10)))) AS line
         |    FROM read_parquet('$codeInputPath/*.parquet')),
         |nb AS (SELECT id, CAST(concat('0x', substr(md5(line), 1, 15))
         |      AS BIGINT) AS lh
         |    FROM l WHERE trim(line) <> ''),
         |d AS (SELECT lh, CAST(count(*) AS BIGINT) AS df FROM nb GROUP BY 1)
         |SELECT id, count(*) AS n_lines,
         |  CAST(sum(CASE WHEN df >= 20 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_boiler,
         |  CAST(sum(CASE WHEN df >= 20 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS boiler_frac
         |FROM nb JOIN d USING(lh) GROUP BY id""".stripMargin,

    "c_ext_lang" ->
      s"""SELECT id, lang, regexp_extract(path, '\\.([a-z]+)$$', 1) AS ext,
         |  COALESCE(regexp_extract(path, '\\.([a-z]+)$$', 1) =
         |    CASE WHEN lang IN ('scala', 'java', 'python', 'rust', 'go', 'c',
         |                       'cpp', 'js', 'ts', 'ruby')
         |         THEN CASE lang WHEN 'python' THEN 'py' WHEN 'ruby' THEN 'rb'
         |              ELSE lang END END, false) AS consistent
         |FROM read_parquet('$codeInputPath/*.parquet')""".stripMargin,

    // exact replay of the engine's All-Pairs result over normalized code:
    // thresholded Jaccard is candidate-order-independent, so the naive
    // shingle self-join at 2k files equals the prefix-filtered plan
    "c_near_dup" ->
      s"""WITH $codeQualityCteSql,
         |keep AS (SELECT id FROM q WHERE NOT (autogen OR max_line_len > 1000
         |  OR mean_line_len > 100.0 OR coalesce(alnum_frac < 0.25, false))),
         |n AS (SELECT c.id AS doc_id, trim(lower(regexp_replace(
         |    CASE WHEN lang IN ('python', 'ruby')
         |      THEN regexp_replace(content, '(?m)^[ \\t]*#[^\\n]*\\n?', '', 'g')
         |      ELSE regexp_replace(content, '(?m)^[ \\t]*//[^\\n]*\\n?', '', 'g')
         |    END, '[^A-Za-z0-9]+', ' ', 'g'))) AS nrm
         |  FROM read_parquet('$codeInputPath/*.parquet') c
         |  JOIN keep k ON c.id = k.id),
         |tk AS (SELECT doc_id, regexp_split_to_array(nrm, '\\s+') tk
         |  FROM n WHERE length(nrm) > 0),
         |s AS (SELECT doc_id, list_distinct(list_transform(
         |  generate_series(1, greatest(len(tk) - 2, 1)),
         |  i -> array_to_string(tk[i:i+2], ' '))) sh FROM tk),
         |sr0 AS (SELECT doc_id, unnest(sh) AS shg FROM s),
         |sr AS (SELECT DISTINCT doc_id,
         |         CAST(concat('0x', substr(md5(shg), 1, 15)) AS BIGINT) AS shg
         |       FROM sr0),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sr GROUP BY doc_id),
         |ov AS (SELECT sa.doc_id ia, sb.doc_id ib, count(*) c
         |       FROM sr sa JOIN sr sb ON sa.shg = sb.shg AND sa.doc_id < sb.doc_id
         |       GROUP BY ia, ib)
         |SELECT ia AS id_a, ib AS id_b, c * 1.0 / (a.sz + b.sz - c) AS jaccard
         |FROM ov JOIN sz a ON a.doc_id = ov.ia JOIN sz b ON b.doc_id = ov.ib
         |WHERE 2 * c >= (a.sz + b.sz - c)""".stripMargin,

    // the full-pipeline replay: every stage's CTE is the (already
    // verified) standalone oracle's, composed in the engine's order;
    // final sha256 over the rewritten content pins redaction + strip +
    // rebuild byte-for-byte
    "p_code_clean" ->
      s"""WITH $codeQualityCteSql,
         |keep AS (SELECT id FROM q WHERE NOT (autogen OR max_line_len > 1000
         |  OR mean_line_len > 100.0 OR coalesce(alnum_frac < 0.25, false))),
         |hd AS (SELECT id, substring(content, 1, 400) AS head
         |  FROM read_parquet('$codeInputPath/*.parquet')),
         |lic AS (SELECT id, CASE
         |  WHEN regexp_extract(head, '${graft.text.CodeOps.SpdxRe}', 1) <> ''
         |    THEN regexp_extract(head, '${graft.text.CodeOps.SpdxRe}', 1)
         |  WHEN contains(head, 'Permission is hereby granted, free of charge')
         |    THEN 'MIT'
         |  WHEN regexp_matches(head, 'Apache License,? Version 2\\.0')
         |    THEN 'Apache-2.0'
         |  WHEN contains(head, 'GNU General Public License') THEN 'GPL'
         |  WHEN contains(head, 'Redistribution and use in source and binary forms')
         |    THEN 'BSD'
         |  END AS license FROM hd),
         |nonperm AS (SELECT id FROM lic WHERE license IS NOT NULL
         |  AND license NOT IN ('MIT', 'Apache-2.0', 'BSD', 'BSD-2-Clause',
         |    'BSD-3-Clause', 'ISC', 'Unlicense')),
         |g AS (SELECT c.id, c.lang, c.content
         |  FROM read_parquet('$codeInputPath/*.parquet') c
         |  JOIN keep USING(id)
         |  WHERE c.id NOT IN (SELECT id FROM nonperm)),
         |red AS (SELECT id, lang, regexp_replace(regexp_replace(
         |    regexp_replace(content,
         |    '${graft.text.CodeOps.SecretAwsRe}', '<SECRET>', 'g'),
         |    '${graft.text.CodeOps.SecretGithubRe}', '<SECRET>', 'g'),
         |    '${graft.text.CodeOps.SecretPemRe}', '<SECRET>', 'g')
         |    AS content FROM g),
         |pl AS (SELECT id,
         |    unnest(generate_series(1, len(string_split(content, chr(10)))))
         |      AS pos,
         |    unnest(string_split(content, chr(10))) AS line
         |  FROM red),
         |dl AS (SELECT DISTINCT id, CAST(concat('0x',
         |    substr(md5(line), 1, 15)) AS BIGINT) AS lh
         |  FROM pl WHERE trim(line) <> ''),
         |bo AS (SELECT lh FROM (SELECT lh, count(*) AS df FROM dl GROUP BY 1)
         |  WHERE df >= 20),
         |rb AS (SELECT id, string_agg(line, chr(10) ORDER BY pos) AS content
         |  FROM pl WHERE trim(line) = '' OR CAST(concat('0x',
         |    substr(md5(line), 1, 15)) AS BIGINT) NOT IN (SELECT lh FROM bo)
         |  GROUP BY id),
         |n AS (SELECT g.id AS doc_id, trim(lower(regexp_replace(
         |    CASE WHEN lang IN ('python', 'ruby')
         |      THEN regexp_replace(content, '(?m)^[ \\t]*#[^\\n]*\\n?', '', 'g')
         |      ELSE regexp_replace(content, '(?m)^[ \\t]*//[^\\n]*\\n?', '', 'g')
         |    END, '[^A-Za-z0-9]+', ' ', 'g'))) AS nrm FROM g),
         |tk AS (SELECT doc_id, regexp_split_to_array(nrm, '\\s+') tk
         |  FROM n WHERE length(nrm) > 0),
         |s AS (SELECT doc_id, list_distinct(list_transform(
         |  generate_series(1, greatest(len(tk) - 2, 1)),
         |  i -> array_to_string(tk[i:i+2], ' '))) sh FROM tk),
         |sr0 AS (SELECT doc_id, unnest(sh) AS shg FROM s),
         |sr AS (SELECT DISTINCT doc_id,
         |         CAST(concat('0x', substr(md5(shg), 1, 15)) AS BIGINT) AS shg
         |       FROM sr0),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sr GROUP BY doc_id),
         |ov AS (SELECT sa.doc_id ia, sb.doc_id ib, count(*) c
         |       FROM sr sa JOIN sr sb ON sa.shg = sb.shg AND sa.doc_id < sb.doc_id
         |       GROUP BY ia, ib),
         |dd AS (SELECT DISTINCT ib AS id
         |       FROM ov JOIN sz a ON a.doc_id = ov.ia
         |                JOIN sz b ON b.doc_id = ov.ib
         |       WHERE 2 * c >= (a.sz + b.sz - c))
         |SELECT g.id, g.lang,
         |  length(coalesce(rb.content, '')) AS n_chars,
         |  sha256(coalesce(rb.content, '')) AS sha
         |FROM g LEFT JOIN rb USING(id)
         |WHERE g.id NOT IN (SELECT id FROM dd)""".stripMargin,

    // independent replay of import extraction: per-lang literal patterns
    // (one UNION ALL branch per family), per-file dedup via list_distinct
    // (mirrors the engine's array_distinct-before-explode), then group
    "c_lang_detect" -> {
      import graft.text.CodeOps
      def sq(re: String) = re.replace("'", "''")
      val scores = CodeOps.DetectLangs.map { l =>
        val fam = CodeOps.ImportRes.find(_._1.contains(l)).get._2
        val cf = if (l == "python" || l == "ruby") CodeOps.CommentHashRe
          else CodeOps.CommentSlashRe
        s"  CASE WHEN regexp_matches(content, '${sq(fam)}') THEN 2 ELSE 0 END" +
          s" + CASE WHEN regexp_matches(content, '${sq(cf)}') THEN 1 ELSE 0 END AS s_$l"
      }.mkString(",\n")
      val mx = CodeOps.DetectLangs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val det = CodeOps.DetectLangs
        .map(l => s"CASE WHEN s_$l = mx THEN '$l' END").mkString(", ")
      val decl = "CASE lang " +
        CodeOps.DetectLangs.map(l => s"WHEN '$l' THEN s_$l").mkString(" ") +
        " ELSE -1 END"
      s"""WITH s AS (SELECT id, lang,
         |$scores
         |FROM read_parquet('$codeInputPath/*.parquet')),
         |m AS (SELECT *, $mx AS mx FROM s)
         |SELECT id, lang,
         |  CASE WHEN mx >= 2 THEN concat_ws(',', $det) END AS detected,
         |  mx AS score,
         |  CASE WHEN mx >= 2 THEN CAST($decl = mx AS INT) END AS agree
         |FROM m""".stripMargin
    },

    "c_imports" ->
      s"""WITH src AS (SELECT repo, lang, content
         |  FROM read_parquet('$codeInputPath/*.parquet')),
         |im AS (
         |  SELECT repo, lang, unnest(list_distinct(regexp_extract_all(
         |    content, '(?m)^import ([A-Za-z0-9_]+)$$', 1))) AS module
         |  FROM src WHERE lang = 'python'
         |  UNION ALL SELECT repo, lang, unnest(list_distinct(
         |    regexp_extract_all(content,
         |      '(?m)^require ''([A-Za-z0-9_]+)''$$', 1)))
         |  FROM src WHERE lang = 'ruby'
         |  UNION ALL SELECT repo, lang, unnest(list_distinct(
         |    regexp_extract_all(content,
         |      '(?m)^import "([A-Za-z0-9_]+)"$$', 1)))
         |  FROM src WHERE lang = 'go'
         |  UNION ALL SELECT repo, lang, unnest(list_distinct(
         |    regexp_extract_all(content, '(?m)^use ([A-Za-z0-9_]+);$$', 1)))
         |  FROM src WHERE lang = 'rust'
         |  UNION ALL SELECT repo, lang, unnest(list_distinct(
         |    regexp_extract_all(content,
         |      '(?m)^import ([A-Za-z0-9_]+);$$', 1)))
         |  FROM src WHERE lang IN ('java', 'scala')
         |  UNION ALL SELECT repo, lang, unnest(list_distinct(
         |    regexp_extract_all(content,
         |      '(?m)^#include <([A-Za-z0-9_]+)\\.h>$$', 1)))
         |  FROM src WHERE lang IN ('c', 'cpp')
         |  UNION ALL SELECT repo, lang, unnest(list_distinct(
         |    regexp_extract_all(content,
         |      '(?m)^const [A-Za-z0-9_]+ = require\\(''([A-Za-z0-9_]+)''\\)$$',
         |      1)))
         |  FROM src WHERE lang IN ('js', 'ts'))
         |SELECT lang, module, count(*) AS n_files,
         |  count(DISTINCT repo) AS n_repos
         |FROM im GROUP BY 1, 2""".stripMargin,

    // independent replay of fork detection: distinct (repo, file-hash),
    // df guard 2..100, self-join, containment = shared / min sizes (one
    // long/long double division — bit-exact vs Spark)
    "c_forks" ->
      s"""WITH rf AS (SELECT DISTINCT repo,
         |    CAST(concat('0x', substr(md5(concat(coalesce(path, ''), '|',
         |      content)), 1, 15)) AS BIGINT) AS f
         |  FROM read_parquet('$forkInputPath/*.parquet')),
         |sizes AS (SELECT repo, count(*) AS n FROM rf GROUP BY repo),
         |rare AS (SELECT f FROM rf GROUP BY f
         |         HAVING count(*) BETWEEN 2 AND 100),
         |pairs AS (SELECT a.repo AS repo_a, b.repo AS repo_b,
         |    count(*) AS shared_files
         |  FROM rf a JOIN rare USING (f) JOIN rf b USING (f)
         |  WHERE a.repo < b.repo GROUP BY 1, 2)
         |SELECT repo_a, repo_b, shared_files, sa.n AS files_a,
         |  sb.n AS files_b,
         |  shared_files / least(sa.n, sb.n) AS containment
         |FROM pairs
         |JOIN sizes sa ON sa.repo = pairs.repo_a
         |JOIN sizes sb ON sb.repo = pairs.repo_b
         |WHERE shared_files >= 3
         |  AND shared_files / least(sa.n, sb.n) >= 0.5""".stripMargin,

    // independent replay of the path-family card: the same fixed-priority
    // CASE over the same RE2-safe patterns, counter sums, one division
    "c_paths" -> {
      import graft.text.CodeOps
      def cnt(v: String) =
        s"CAST(sum(CASE WHEN pc = '$v' THEN 1 ELSE 0 END) AS BIGINT)"
      s"""WITH k AS (SELECT repo, path,
         |  CASE WHEN path IS NULL THEN NULL
         |       WHEN regexp_matches(path, '${CodeOps.PathVendoredRe}')
         |         THEN 'vendored'
         |       WHEN regexp_matches(path, '${CodeOps.PathGeneratedRe}')
         |         THEN 'generated'
         |       WHEN regexp_matches(path, '${CodeOps.PathTestRe}')
         |         THEN 'test'
         |       WHEN regexp_matches(path, '${CodeOps.PathDocsRe}')
         |         THEN 'docs'
         |       ELSE 'source' END AS pc
         |  FROM read_parquet('$codeInputPath/*.parquet')),
         |a AS (SELECT repo, count(*) AS n_files,
         |  ${cnt("source")} AS n_source, ${cnt("test")} AS n_test,
         |  ${cnt("vendored")} AS n_vendored,
         |  ${cnt("generated")} AS n_generated, ${cnt("docs")} AS n_docs,
         |  CAST(sum(CASE WHEN path IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_nopath
         |  FROM k GROUP BY repo)
         |SELECT a.*, CASE WHEN n_test + n_source > 0 THEN
         |    CAST(n_test AS DOUBLE) / CAST(n_test + n_source AS DOUBLE)
         |  END AS test_ratio
         |FROM a""".stripMargin
    },

    // independent replay of the notebook extraction: DuckDB from_json ->
    // double unnest -> cell-level + line-level aggregates (count over cells
    // == the engine's countDistinct over cell ordinals); json_valid guards
    // the malformed rows the engine's PERMISSIVE parse nulls out
    "c_notebook" ->
      s"""WITH t AS (SELECT nb_id, nb_json
         |    FROM read_parquet('$nbInputPath/*.parquet')),
         |p AS (SELECT nb_id, CASE WHEN json_valid(nb_json) THEN
         |    from_json(nb_json, '{"cells":[{"cell_type":"VARCHAR",
         |      "source":["VARCHAR"]}],"nbformat":"BIGINT"}') END AS nb
         |  FROM t),
         |v AS (SELECT nb_id,
         |    CASE WHEN nb.cells IS NOT NULL THEN 1 ELSE 0 END AS valid
         |  FROM p),
         |cells AS (SELECT nb_id, unnest(nb.cells) AS cell FROM p
         |  WHERE nb.cells IS NOT NULL),
         |a1 AS (SELECT nb_id, count(*) AS n_cells,
         |    count(CASE WHEN cell.cell_type = 'code' THEN 1 END) AS n_code
         |  FROM cells GROUP BY nb_id),
         |lines AS (SELECT nb_id, cell.cell_type AS ct,
         |    unnest(cell.source) AS line FROM cells),
         |a2 AS (SELECT nb_id,
         |    count(CASE WHEN ct = 'code' THEN line END) AS n_code_lines,
         |    CAST(coalesce(sum(CASE WHEN ct = 'code' THEN length(line) END),
         |      0) AS BIGINT) AS code_chars
         |  FROM lines GROUP BY nb_id)
         |SELECT t.nb_id, v.valid,
         |  CASE WHEN valid = 1 THEN coalesce(a1.n_cells, 0) END AS n_cells,
         |  CASE WHEN valid = 1 THEN coalesce(a1.n_code, 0) END AS n_code,
         |  CASE WHEN valid = 1 THEN coalesce(a2.n_code_lines, 0) END
         |    AS n_code_lines,
         |  CASE WHEN valid = 1 THEN coalesce(a2.code_chars, 0) END
         |    AS code_chars
         |FROM t JOIN v USING (nb_id) LEFT JOIN a1 USING (nb_id)
         |  LEFT JOIN a2 USING (nb_id)""".stripMargin,

    // independent replay of the complexity metrics: match counts via
    // length(regexp_extract_all), the same 8-step depth CASE ladder, the
    // same single double division
    "c_complexity" -> {
      val ladder = (8 to 1 by -1).map(k =>
        s"WHEN regexp_matches(content, '(?m)^ {${4 * k},}[^ \\n]') THEN $k")
        .mkString(" ")
      s"""WITH b AS (SELECT id, lang,
         |    CAST(length(regexp_extract_all(content,
         |      '${graft.text.CodeOps.DefCountRe}')) AS INT) AS n_defs,
         |    CAST(length(regexp_extract_all(content,
         |      '${graft.text.CodeOps.BranchRe}')) AS INT) AS n_branches,
         |    CASE $ladder ELSE 0 END AS max_depth
         |  FROM read_parquet('$codeInputPath/*.parquet'))
         |SELECT id, lang, n_defs, n_branches, max_depth,
         |  n_defs + n_branches AS cyclomatic,
         |  CASE WHEN n_defs > 0 THEN
         |    CAST(n_defs + n_branches AS DOUBLE) / CAST(n_defs AS DOUBLE)
         |  END AS mean_cc,
         |  CAST(max_depth >= 4 AS INT) AS deep
         |FROM b""".stripMargin
    },

    // independent replay of the duplicate-definition scan: same extract →
    // per-file list_distinct → unnest → two distinct counts
    "c_symbols" -> {
      val re = graft.text.CodeOps.DefRe // no '' to escape, backslashes literal
      s"""WITH syms AS (SELECT id, repo,
         |    unnest(list_distinct(regexp_extract_all(content, '$re', 1)))
         |      AS symbol
         |  FROM read_parquet('$codeInputPath/*.parquet'))
         |SELECT symbol, CAST(count(DISTINCT id) AS BIGINT) AS n_files,
         |  CAST(count(DISTINCT repo) AS BIGINT) AS n_repos
         |FROM syms GROUP BY symbol
         |HAVING count(DISTINCT id) >= 2""".stripMargin
    },

    "c_repo_card" ->
      s"""SELECT repo, count(*) AS n_files,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(sum(length(content)) AS BIGINT) AS total_chars,
         |  CAST(sum(CASE WHEN regexp_matches(substring(content, 1, 200),
         |    '${graft.text.CodeOps.autogenPattern}') THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_autogen,
         |  CAST(sum(CASE WHEN regexp_matches(content, '${graft.text.CodeOps.SecretAwsRe}')
         |    OR regexp_matches(content, '${graft.text.CodeOps.SecretGithubRe}')
         |    OR regexp_matches(content, '${graft.text.CodeOps.SecretPemRe}')
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_secret_files
         |FROM read_parquet('$codeInputPath/*.parquet')
         |GROUP BY repo""".stripMargin,

    // independent replay of the chunker: same ceil(n/stride) ordinal
    // fan-out, 1-based inclusive list slices (both engines clamp past-end)
    "t_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST((len(string_split(text, ' ')) + 47) // 48 AS INT) AS nc
        |  FROM documents),
        |c AS (SELECT doc_id, toks,
        |    CAST(unnest(generate_series(0, nc - 1)) AS INT) AS chunk_id
        |  FROM t)
        |SELECT doc_id, chunk_id,
        |  CAST(len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS INT)
        |    AS n_tokens,
        |  array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
        |    AS chunk
        |FROM c""".stripMargin,

    // independent replay of the frequency stats: same explode/agg/join
    // shape in SQL; only integer counts and double divisions
    "t_tok_freq" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS mean_tok_freq,
        |  CAST(sum(CASE WHEN cnt <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS rare_frac,
        |  CAST(count(DISTINCT tok) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS distinct_frac
        |FROM toks JOIN freq USING (tok)
        |GROUP BY doc_id""".stripMargin,

    // bigram-LM scoring: the oracle re-derives bigrams positionally
    // (1-based list slicing), recomputes the smoothed model with the
    // IDENTICAL operand order ((c2 + 1.0) / (c1 + CAST(v AS DOUBLE))),
    // pins each distinct bigram's ln to 1e-4 units with the same
    // round-half-away, and replays the integer per-doc sums
    "t_ppl" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS arr
        |  FROM documents),
        |bg AS (SELECT doc_id, arr[i] AS w1, arr[i + 1] AS w2
        |       FROM d, UNNEST(generate_series(1, len(arr) - 1)) AS t(i)
        |       WHERE len(arr) >= 2),
        |bgc AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
        |c1t AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bgc
        |        GROUP BY w1),
        |vt AS (SELECT count(DISTINCT tok) AS v FROM (
        |         SELECT unnest(string_split(text, ' ')) AS tok
        |         FROM documents) WHERE tok <> ''),
        |lp AS (SELECT b.w1, b.w2, CAST(round(
        |         ln((b.c2 + 1.0) / (c.c1 + CAST(v.v AS DOUBLE)))
        |           * 10000, 0) AS BIGINT) AS lp_fp
        |       FROM bgc b JOIN c1t c ON b.w1 = c.w1 CROSS JOIN vt v),
        |sc AS (SELECT bg.doc_id, count(*) AS n_bigrams,
        |         CAST(sum(lp.lp_fp) AS BIGINT) AS sum_lp_fp
        |       FROM bg JOIN lp ON bg.w1 = lp.w1 AND bg.w2 = lp.w2
        |       GROUP BY bg.doc_id)
        |SELECT doc_id, n_bigrams, sum_lp_fp,
        |  sum_lp_fp >= -90000 * n_bigrams AS keep
        |FROM sc""".stripMargin,

    // duplicated spans: the oracle re-derives every 20-token window
    // positionally (1-based list slicing), replays the md5-60bit span
    // hash verbatim, and picks the representative with a window
    "t_dup_spans" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS arr
        |  FROM documents),
        |sp AS (SELECT doc_id, i AS p,
        |         array_to_string(arr[i : i + 19], ' ') AS span
        |       FROM d, UNNEST(generate_series(1, len(arr) - 19)) AS t(i)
        |       WHERE len(arr) >= 20),
        |hh AS (SELECT doc_id, p,
        |         CAST(concat('0x', substr(md5(span), 1, 15)) AS BIGINT)
        |           AS h
        |       FROM sp),
        |agg AS (SELECT h, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |          count(*) AS n_occ
        |        FROM hh GROUP BY h),
        |rep AS (SELECT h, doc_id AS first_doc, CAST(p AS BIGINT)
        |          AS first_pos
        |        FROM (SELECT h, doc_id, p, row_number() OVER (
        |                PARTITION BY h ORDER BY doc_id, p) AS rn FROM hh)
        |        WHERE rn = 1)
        |SELECT agg.h AS span_hash, agg.n_docs, agg.n_occ,
        |  rep.first_doc, rep.first_pos
        |FROM agg JOIN rep USING (h) WHERE agg.n_docs >= 2""".stripMargin,

    // packing: the oracle replays the concatenation with ONE global
    // window cumsum (fine at oracle scale; the engine's two-level
    // scan must land on identical integers)
    "t_pack" ->
      """WITH toks AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS start_tok
        |      FROM toks)
        |SELECT doc_id, n_tok, start_tok,
        |  start_tok // 2048 AS first_block,
        |  CASE WHEN n_tok = 0 THEN start_tok // 2048
        |       ELSE (start_tok + n_tok - 1) // 2048 END AS last_block
        |FROM c""".stripMargin,

    // span scrub: the oracle re-derives occurrences, keeps the
    // lexicographically-first, unions removed positions, rebuilds the
    // cleaned text with string_agg ORDER BY idx, and matches sha256
    "t_span_scrub" ->
      """WITH d AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS arr
        |  FROM documents),
        |sp AS (SELECT doc_id, i AS p,
        |         CAST(concat('0x', substr(md5(
        |           array_to_string(arr[i : i + 19], ' ')), 1, 15))
        |           AS BIGINT) AS h
        |       FROM d, UNNEST(generate_series(1, len(arr) - 19)) AS t(i)
        |       WHERE len(arr) >= 20),
        |dup AS (SELECT h, min({'d': doc_id, 'p': p}) AS rep
        |        FROM sp GROUP BY h
        |        HAVING count(DISTINCT doc_id) >= 2),
        |bad AS (SELECT sp.doc_id, sp.p FROM sp JOIN dup ON sp.h = dup.h
        |        WHERE NOT (sp.doc_id = dup.rep.d AND sp.p = dup.rep.p)),
        |pos AS (SELECT DISTINCT doc_id, pp
        |        FROM bad, UNNEST(generate_series(p, p + 19)) AS t(pp)),
        |tok AS (SELECT doc_id, i AS idx, arr[i] AS tok
        |        FROM d, UNNEST(generate_series(1, len(arr))) AS t(i)),
        |kept AS (SELECT tok.doc_id, tok.idx, tok.tok FROM tok
        |         LEFT JOIN pos ON tok.doc_id = pos.doc_id
        |           AND tok.idx = pos.pp
        |         WHERE pos.doc_id IS NULL),
        |cl AS (SELECT doc_id, count(*) AS n_kept,
        |         string_agg(tok, ' ' ORDER BY idx) AS txt
        |       FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(d.arr) AS BIGINT) AS n_tokens,
        |  CAST(len(d.arr) - COALESCE(cl.n_kept, 0) AS BIGINT) AS n_removed,
        |  sha256(COALESCE(cl.txt, '')) AS cleaned_sha
        |FROM d LEFT JOIN cl ON d.doc_id = cl.doc_id""".stripMargin,

    "t_pii" -> {
      s"""WITH p AS (SELECT doc_id, text || ' ' || CASE CAST(doc_id % 3 AS INT)
         |  WHEN 0 THEN 'no personal data here'
         |  WHEN 1 THEN 'mail bob' || CAST(doc_id % 10 AS VARCHAR) || '@example.com now'
         |  ELSE 'ip 10.1.' || CAST(doc_id % 200 AS VARCHAR) ||
         |    '.7 and a@b.io plus tel +1 555-000-' ||
         |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END AS s
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(s, '${TextOps.PiiEmailRe}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(s, '${TextOps.PiiIpv4Re}')) AS BIGINT) AS n_ipv4,
         |  CAST(len(regexp_extract_all(s, '${TextOps.PiiPhoneRe}')) AS BIGINT) AS n_phone,
         |  sha256(regexp_replace(regexp_replace(regexp_replace(s,
         |    '${TextOps.PiiEmailRe}', '<EMAIL>', 'g'),
         |    '${TextOps.PiiIpv4Re}', '<IP>', 'g'),
         |    '${TextOps.PiiPhoneRe}', '<PHONE>', 'g')) AS redacted_sha
         |FROM p""".stripMargin
    },

    "t_lang_id" -> {
      val p = TextOps.defaultProfiles
      s"""WITH tk0 AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') tk FROM documents),
         |sc AS (SELECT doc_id,
         |  ${langScoreSql(p("de"))} s_de, ${langScoreSql(p("en"))} s_en,
         |  ${langScoreSql(p("es"))} s_es, ${langScoreSql(p("fr"))} s_fr,
         |  ${langScoreSql(p("zh"))} s_zh
         | FROM tk0)
         |SELECT doc_id, CASE
         |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |  WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS lang_pred
         |FROM sc""".stripMargin
    },

    "t_fingerprint" ->
      """WITH tk AS (SELECT doc_id, regexp_split_to_array(text, '\s+') tk FROM documents)
        |SELECT doc_id, list_reduce(list_transform(generate_series(1, len(tk)),
        |    i -> ((CAST(concat('0x', substr(md5(tk[i]),1,15)) AS BIGINT) % 1000000007) * (CAST(i AS BIGINT) % 1000000007)) % 1000000007),
        |  (a, b) -> (a + b) % 1000000007) AS fp
        |FROM tk""".stripMargin,

    "d_minhash_sig" ->
      s"""WITH $shinglesCteSql,
         |hh AS (SELECT doc_id, list_transform(sh, x ->
         |  [CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 1000000007,
         |   CAST(concat('0x', substr(md5(x), 17, 15)) AS BIGINT) % 1000000007]) hs FROM s)
         |SELECT doc_id,
         |  list_min(list_transform(hs, h -> (h[1] + 0 * h[2]) % 1000000007)) AS m0,
         |  list_min(list_transform(hs, h -> (h[1] + 1 * h[2]) % 1000000007)) AS m1,
         |  list_min(list_transform(hs, h -> (h[1] + 2 * h[2]) % 1000000007)) AS m2,
         |  list_min(list_transform(hs, h -> (h[1] + 3 * h[2]) % 1000000007)) AS m3
         |FROM hh""".stripMargin,

    "d_minhash_lsh" ->
      s"""WITH $shinglesCteSql,
         |hh AS (SELECT doc_id, sh, list_transform(sh, x ->
         |  [CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT) % 1000000007,
         |   CAST(concat('0x', substr(md5(x), 17, 15)) AS BIGINT) % 1000000007]) hs FROM s),
         |sig AS (SELECT doc_id, sh, list_transform(generate_series(0, 11),
         |  j -> CAST(list_min(list_transform(hs, h -> (h[1] + j * h[2]) % 1000000007)) AS VARCHAR)) sg FROM hh),
         |bands AS (SELECT doc_id, sh, g.b, md5(array_to_string(sg[g.b*3+1:g.b*3+3], '|')) bh
         |          FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) b) g),
         |pairs AS (SELECT x.doc_id ia, y.doc_id ib,
         |    len(list_intersect(x.sh, y.sh)) * 1.0 / len(list_distinct(x.sh || y.sh)) j
         |  FROM bands x JOIN bands y ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id)
         |SELECT ia AS id_a, ib AS id_b, max(j) AS jaccard FROM pairs
         |WHERE j >= 0.5 GROUP BY ia, ib""".stripMargin,

    // Composed replay of the cleaning pipeline: exact-dedup survivors ->
    // all-pairs Jaccard drops (verify-only form; identical output to the
    // prefix-filtered engine path) -> language CASE -> quality bounds.
    "p_corpus_clean" -> {
      val p = TextOps.defaultProfiles
      s"""WITH ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
         |d2 AS (SELECT d.doc_id, d.text FROM documents d JOIN ex USING (doc_id)),
         |tk2 AS (SELECT doc_id, regexp_split_to_array(text, '\\s+') tkk FROM d2),
         |s2 AS (SELECT doc_id, list_distinct(list_transform(
         |  generate_series(1, greatest(len(tkk) - 2, 1)),
         |  i -> array_to_string(tkk[i:i+2], ' '))) sh FROM tk2),
         |sr AS (SELECT doc_id, unnest(sh) AS shg FROM s2),
         |sz AS (SELECT doc_id, len(sh) AS sz FROM s2),
         |ov AS (SELECT sa.doc_id ia, sb.doc_id ib, count(*) c
         |       FROM sr sa JOIN sr sb ON sa.shg = sb.shg AND sa.doc_id < sb.doc_id
         |       GROUP BY ia, ib),
         |drops AS (SELECT DISTINCT ov.ib AS doc_id
         |          FROM ov JOIN sz a ON a.doc_id = ov.ia JOIN sz b ON b.doc_id = ov.ib
         |          WHERE 2 * c >= (a.sz + b.sz - c)),
         |k2 AS (SELECT * FROM d2 WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
         |tk0 AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') tk FROM k2),
         |sc AS (SELECT doc_id,
         |  ${langScoreSql(p("de"))} s_de, ${langScoreSql(p("en"))} s_en,
         |  ${langScoreSql(p("es"))} s_es, ${langScoreSql(p("fr"))} s_fr,
         |  ${langScoreSql(p("zh"))} s_zh
         | FROM tk0),
         |lang AS (SELECT doc_id, CASE
         |  WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |  WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |  WHEN s_fr >= s_zh THEN 'fr' ELSE 'zh' END AS lang_pred FROM sc),
         |q AS (SELECT doc_id,
         |  round(length(text) * 1.0 / len(string_split(text, ' ')), 3) AS chars_per_token,
         |  len(string_split(text, ' ')) AS ntok FROM k2)
         |SELECT k2.doc_id, lang_pred, chars_per_token
         |FROM k2 JOIN lang USING (doc_id) JOIN q USING (doc_id)
         |WHERE lang_pred = 'en' AND ntok >= 10 AND chars_per_token <= 8.0""".stripMargin
    },

    // Oracle needs no prefix filter: the verify step makes the output
    // identical whether candidates come prefix-pruned or all-pairs, and
    // DuckDB at sf0.01 can afford the naive shingle self-join.
    "d_jaccard_ngram" ->
      // intersections run on the SAME 60-bit md5 shingle ids the engine
      // uses (hash60 replay), so both sides agree bit-for-bit even on a
      // hypothetical hash collision
      s"""WITH $shinglesCteSql,
         |sr0 AS (SELECT doc_id, unnest(sh) AS shg FROM s),
         |sr AS (SELECT DISTINCT doc_id,
         |         CAST(concat('0x', substr(md5(shg), 1, 15)) AS BIGINT) AS shg
         |       FROM sr0),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sr GROUP BY doc_id),
         |ov AS (SELECT sa.doc_id ia, sb.doc_id ib, count(*) c
         |       FROM sr sa JOIN sr sb ON sa.shg = sb.shg AND sa.doc_id < sb.doc_id
         |       GROUP BY ia, ib)
         |SELECT ia AS id_a, ib AS id_b, c * 1.0 / (a.sz + b.sz - c) AS jaccard
         |FROM ov JOIN sz a ON a.doc_id = ov.ia JOIN sz b ON b.doc_id = ov.ib
         |WHERE 2 * c >= (a.sz + b.sz - c)""".stripMargin,

    "d_simhash" ->
      s"""WITH $simhashCteSql
         |SELECT doc_id, sig FROM sig""".stripMargin,

    "d_simhash_pairs" ->
      s"""WITH $simhashCteSql
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,

    // transitive closure via recursive CTE: min reachable id per node ==
    // the engine's min-label-propagation fixpoint
    "d_components" ->
      s"""WITH RECURSIVE $simhashCteSql,
         |p AS (SELECT a.doc_id id_a, b.doc_id id_b FROM sig a JOIN sig b
         |      ON a.doc_id < b.doc_id
         |      WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |e AS (SELECT id_a a, id_b b FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |n AS (SELECT DISTINCT a AS id FROM e),
         |reach(id, r) AS (
         |  SELECT id, id FROM n
         |  UNION
         |  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.id
         |)
         |SELECT id, CAST(min(r) AS BIGINT) AS component
         |FROM reach GROUP BY id""".stripMargin,

    "s_ann_brute" ->
      s"""WITH $normCteSql,
         |q AS (SELECT vec_id query_id, v qv FROM nv WHERE vec_id < 8),
         |c AS (SELECT vec_id neighbor_id, v cv FROM nv),
         |sc AS (SELECT query_id, neighbor_id, ${ndotSql("qv", "cv")} AS cos
         |       FROM q JOIN c ON query_id <> neighbor_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos
         |FROM (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) rank
         |      FROM sc)
         |WHERE rank <= 5""".stripMargin,

    "s_ann_lsh" ->
      s"""WITH ${autoBucketCteSql(annTargetLoad)},
         |$normCteSql,
         |eb AS (SELECT n.vec_id, n.v, bk.bucket FROM nv n JOIN bk USING (vec_id)),
         |gd AS (SELECT * FROM eb QUALIFY count(*) OVER (PARTITION BY bucket) <= $simMaxBucket),
         |sc AS (SELECT x.vec_id query_id, y.vec_id neighbor_id,
         |         ${ndotSql("x.v", "y.v")} AS cos
         |       FROM eb x JOIN gd y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos
         |FROM (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) rank
         |      FROM sc)
         |WHERE rank <= 3""".stripMargin,

    // Replays ivfCentroidsPortable (md5-bigint seed order), ivfAssign
    // (argmin d2, ties -> smaller cid), ivfProbes (2 nearest cells) and the
    // cosine ranking — every double an in-order fold, so hash-exact.
    "s_ann_ivf" ->
      s"""WITH sd AS (
         |  SELECT cid, cv FROM (
         |    SELECT row_number() OVER (ORDER BY
         |        CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)),1,15)) AS BIGINT)) - 1 AS cid,
         |      list_transform(generate_series(1,64), i -> CAST(embedding[i] AS DOUBLE)) AS cv
         |    FROM embeddings) WHERE cid < $ivfCells),
         |asg AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, sd.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${ivfD2Sql("e.embedding", "sd.cv")}, sd.cid) AS rn
         |    FROM embeddings e CROSS JOIN sd) WHERE rn = 1),
         |prb AS (
         |  SELECT vec_id, cid AS cell FROM (
         |    SELECT e.vec_id, sd.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${ivfD2Sql("e.embedding", "sd.cv")}, sd.cid) AS rn
         |    FROM embeddings e CROSS JOIN sd WHERE e.vec_id < 8) WHERE rn <= $ivfNprobe),
         |$normCteSql,
         |sc AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
         |         ${ndotSql("q.v", "c.v")} AS cos
         |       FROM prb p JOIN asg a ON p.cell = a.cell AND p.vec_id <> a.vec_id
         |       JOIN nv q ON q.vec_id = p.vec_id
         |       JOIN nv c ON c.vec_id = a.vec_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos
         |FROM (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) rank
         |      FROM sc)
         |WHERE rank <= 3""".stripMargin,

    // strict int_type is emitted even for a NULL input (pydantic: None
    // against strict int is int_type; the engine's typeViolation is
    // likewise ungated — nullability is the Nullable wrapper's concern)
    "v_strict" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN source IS NULL THEN 0
        |       WHEN regexp_extract(source, '([0-9]{1,17})', 1) = '' THEN 1
        |       ELSE 0 END AS INT) AS lax_nviol,
        |  CASE WHEN source IS NOT NULL
        |         AND regexp_extract(source, '([0-9]{1,17})', 1) = ''
        |       THEN 'int_parsing' END AS lax_vtype,
        |  'int_type' AS strict_vtype,
        |  CASE WHEN source IS NULL OR regexp_extract(source, '([0-9]{1,17})', 1) = ''
        |       THEN NULL
        |       ELSE CAST(regexp_extract(source, '([0-9]{1,17})', 1) AS BIGINT)
        |  END AS lax_value
        |FROM documents""".stripMargin,

    "v_part_verdict" ->
      """WITH viol AS (
        |  SELECT source FROM documents WHERE doc_id IS NULL
        |  UNION ALL SELECT source FROM documents WHERE doc_id < 0
        |  UNION ALL SELECT source FROM documents WHERE text IS NULL
        |  UNION ALL SELECT source FROM documents WHERE length(text) < 100
        |  UNION ALL SELECT source FROM documents WHERE length(text) > 500
        |  UNION ALL SELECT source FROM documents WHERE lang IS NULL
        |  UNION ALL SELECT source FROM documents WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr')
        |  UNION ALL SELECT source FROM documents WHERE source IS NULL
        |  UNION ALL SELECT source FROM documents WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]+$')
        |  UNION ALL SELECT source FROM documents WHERE n_chars IS NULL
        |  UNION ALL SELECT source FROM documents WHERE n_chars < 1
        |  UNION ALL SELECT source FROM documents WHERE n_chars > 1000),
        |vc AS (SELECT source, CAST(count(*) AS BIGINT) violation_count FROM viol GROUP BY source),
        |fl AS (SELECT source, CASE WHEN
        |    coalesce(doc_id >= 0 AND length(text) >= 100 AND length(text) <= 500
        |      AND lang IN ('en','de','fr') AND regexp_matches(source, '^src[0-9]+$')
        |      AND n_chars >= 1 AND n_chars <= 1000, FALSE)
        |    AND doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
        |    AND source IS NOT NULL AND n_chars IS NOT NULL
        |  THEN 0 ELSE 1 END inv FROM documents),
        |base AS (SELECT source, count(*) row_count, CAST(sum(inv) AS BIGINT) invalid_rows
        |         FROM fl GROUP BY source)
        |SELECT base.source AS part_id, base.row_count,
        |  coalesce(vc.violation_count, 0) AS violation_count, base.invalid_rows,
        |  base.invalid_rows * 1.0 / base.row_count <= 0.5 AS passed
        |FROM base LEFT JOIN vc ON base.source = vc.source""".stripMargin,

    // independent replay of the freshness check: epoch_us == unix_micros
    // (both exact BIGINT microseconds), same lag algebra
    "v_freshness" ->
      """WITH p AS (SELECT event_type AS part_id, count(*) AS n_rows,
        |    max(epoch_us(ts)) AS last_us
        |  FROM events GROUP BY event_type),
        |g AS (SELECT max(last_us) AS gmax FROM p)
        |SELECT part_id, n_rows, last_us, gmax - last_us AS lag_us,
        |  CAST(gmax - last_us > 1200000000 AS INT) AS stale
        |FROM p, g""".stripMargin,

    // DuckDB's native ASOF JOIN is the independent replay of the engine's
    // union-window as-of (>= : equal timestamps match)
    "e_asof" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |    FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS us, max(value) AS pval
        |    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.us AS click_us,
        |  p.pval AS last_purchase, c.us - p.us AS asof_lag_us
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.us >= p.us""".stripMargin,

    "e_asof_fwd" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |    FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_us(ts) AS us, max(value) AS pval
        |    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.us AS click_us,
        |  p.pval AS next_purchase, p.us - c.us AS lead_us
        |FROM c ASOF LEFT JOIN p
        |  ON c.user_id = p.user_id AND c.us <= p.us""".stripMargin,

    "e_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, value,
        |    event_type FROM events),
        |b AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
        |      OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS nb
        |    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |s AS (SELECT *, CAST(sum(nb) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_seq
        |    FROM b)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(us) AS start_us, max(us) AS end_us,
        |  max(us) - min(us) AS duration_us,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT)
        |    AS sum_cents,
        |  count(DISTINCT event_type) AS n_types
        |FROM s GROUP BY 1, 2""".stripMargin,

    "e_rolling" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
        |  count(*) OVER w AS roll_n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w * 100 AS BIGINT)
        |    AS roll_cents
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "e_range" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS us
        |    FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, epoch_us(ts) AS sus
        |    FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, count(c.us) AS n_clicks
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.us >= p.sus AND c.us <= p.sus + 600000000
        |GROUP BY 1, 2""".stripMargin,

    "e_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 604800000000 AS p FROM events),
        |c AS (SELECT user_id, min(p) AS c FROM a GROUP BY 1)
        |SELECT c.c AS cohort, a.p - c.c AS k,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM a JOIN c USING(user_id) GROUP BY 1, 2""".stripMargin,

    "e_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |    FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1 FROM e
        |    WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN s1 USING(user_id)
        |    WHERE event_type = 'click' AND us > t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN s2 USING(user_id)
        |    WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
        |SELECT s1.user_id, t1, t2, t3,
        |  1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT)
        |    AS stages_reached
        |FROM s1 LEFT JOIN s2 USING(user_id)
        |  LEFT JOIN s3 USING(user_id)""".stripMargin,

    // nearest-rank exact quantiles: identical integer rank arithmetic
    // ((n*num + den - 1) // den) on both engines — bit-exact by design
    "v_quantiles" ->
      """WITH c AS (SELECT lang, n_chars AS v, count(*) AS cnt
        |    FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT lang, v, cnt, CAST(sum(cnt) OVER (PARTITION BY lang
        |      ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |    FROM c),
        |t AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n FROM c GROUP BY 1)
        |SELECT w.lang, qs.q, w.v AS value
        |FROM w JOIN t USING(lang)
        |CROSS JOIN (VALUES ('p50',1,2),('p90',9,10),('p99',99,100))
        |  qs(q, num, den)
        |WHERE (n*num + den - 1) // den > cum - cnt
        |  AND (n*num + den - 1) // den <= cum""".stripMargin,

    // the engine's bounded-heap Aggregator replays against the classic
    // window-rank form — same total order (v DESC, id ASC)
    "q_topk" ->
      """SELECT lang, rank, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars, CAST(row_number() OVER (
        |      PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS INT)
        |    AS rank
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL) t
        |WHERE rank <= 5""".stripMargin,

    "t_mixture" ->
      """WITH n AS (SELECT lang, count(*) AS ns FROM documents
        |    WHERE lang IS NOT NULL GROUP BY 1),
        |m AS (SELECT min(ns) AS nm FROM n)
        |SELECT doc_id, lang, source
        |FROM documents LEFT JOIN n USING(lang), m
        |WHERE lang IS NULL OR CAST(concat('0x',
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |  % ns < nm""".stripMargin,

    // independent replay of the modified z-score anomaly scan: the manual
    // median (row_number ranks, two middle positions, sum/count midpoint)
    // makes every arithmetic step identical to the engine's — long sums,
    // one double division, one multiply — so doubles match bit-for-bit
    "v_anomaly" ->
      s"""WITH s AS (SELECT repo AS part_id, count(*) AS n_rows,
         |    CAST(sum(length(content)) AS BIGINT) AS ms
         |  FROM read_parquet('$codeInputPath/*.parquet') GROUP BY repo),
         |s2 AS (SELECT part_id, n_rows,
         |    CAST(ms AS DOUBLE) / CAST(n_rows AS DOUBLE) AS metric_mean FROM s),
         |r AS (SELECT metric_mean,
         |    row_number() OVER (ORDER BY metric_mean, part_id) AS rk FROM s2),
         |med AS (SELECT sum(metric_mean) / count(*) AS med FROM r,
         |    (SELECT max(rk) AS n FROM r)
         |  WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2),
         |d AS (SELECT s2.*, med.med,
         |    abs(metric_mean - med) AS dev FROM s2, med),
         |r2 AS (SELECT dev,
         |    row_number() OVER (ORDER BY dev, part_id) AS rk FROM d),
         |mad AS (SELECT sum(dev) / count(*) AS mad FROM r2,
         |    (SELECT max(rk) AS n FROM r2)
         |  WHERE rk = (n + 1) // 2 OR rk = (n + 2) // 2)
         |SELECT part_id, n_rows, metric_mean, med AS pop_median,
         |  CASE WHEN mad > 0 THEN 0.6745 * dev / mad END AS mod_z,
         |  CASE WHEN mad > 0 THEN CAST(0.6745 * dev / mad > 3.5 AS INT) END
         |    AS anomaly
         |FROM d, mad""".stripMargin,

    "z_dump_json" ->
      """SELECT to_json(struct_pack(doc_id := doc_id, language := lang,
        |  n_chars := n_chars, n2 := n_chars * 2)) AS json FROM documents""".stripMargin,

    "z_dump_proj" ->
      "SELECT doc_id, lang, source AS src FROM documents",

    "q_complex" ->
      """WITH f AS (SELECT doc_id, CAST(doc_id % 6 AS INT) m,
        |  CAST(doc_id % 100 AS BIGINT) a, CAST(doc_id % 7 AS BIGINT) b,
        |  CAST(doc_id % 50 AS BIGINT) c50, CAST(doc_id % 9 AS BIGINT) b9,
        |  CAST(doc_id % 30 AS BIGINT) b30 FROM documents)
        |SELECT doc_id, m <> 5 AS ok,
        |  CASE m WHEN 0 THEN CAST(a AS DOUBLE) WHEN 1 THEN CAST(c50 AS DOUBLE)
        |         WHEN 2 THEN 0.0 WHEN 3 THEN 0.0
        |         WHEN 4 THEN CAST(a*100 + b*10 AS DOUBLE) END AS re,
        |  CASE m WHEN 0 THEN CAST(b AS DOUBLE) WHEN 1 THEN -(b9 + 0.5)
        |         WHEN 2 THEN CAST(b30 AS DOUBLE) WHEN 3 THEN 1.0
        |         WHEN 4 THEN 0.0 END AS im,
        |  CASE WHEN m = 0 AND a = 0 THEN CAST(b AS VARCHAR) || 'j'
        |       WHEN m = 0 THEN CAST(a AS VARCHAR) || '+' || CAST(b AS VARCHAR) || 'j'
        |       WHEN m = 1 AND c50 = 0 THEN '-' || CAST(b9 AS VARCHAR) || '.5j'
        |       WHEN m = 1 THEN CAST(c50 AS VARCHAR) || '-' || CAST(b9 AS VARCHAR) || '.5j'
        |       WHEN m = 2 THEN CAST(b30 AS VARCHAR) || 'j'
        |       WHEN m = 3 THEN '1j'
        |       WHEN m = 4 AND a*100 + b*10 = 0 THEN '0j'
        |       WHEN m = 4 THEN CAST(a*100 + b*10 AS VARCHAR) || '+0j'
        |  END AS cjson
        |FROM f""".stripMargin,

    "q_fraction" ->
      """WITH f AS (SELECT doc_id, CAST(doc_id % 5 AS INT) m,
        |  CAST(doc_id % 97 + 1 AS BIGINT) a, CAST(doc_id % 13 + 1 AS BIGINT) b,
        |  CAST(doc_id % 10 AS BIGINT) d1 FROM documents),
        |r AS (SELECT doc_id, m,
        |  CASE m WHEN 0 THEN a WHEN 1 THEN a*10 + d1 WHEN 2 THEN -a
        |         WHEN 3 THEN a END num0,
        |  CASE m WHEN 0 THEN b WHEN 1 THEN 10 WHEN 2 THEN 1
        |         WHEN 3 THEN 100 END den0 FROM f)
        |SELECT doc_id,
        |  CAST(num0 // gcd(abs(num0), den0) AS BIGINT) AS num,
        |  CAST(den0 // gcd(abs(num0), den0) AS BIGINT) AS den,
        |  CASE WHEN m = 4 THEN 'fraction_parsing' END AS vtype,
        |  CASE WHEN m = 4 THEN NULL
        |       WHEN den0 // gcd(abs(num0), den0) = 1
        |         THEN CAST(num0 // gcd(abs(num0), den0) AS VARCHAR)
        |       ELSE CAST(num0 // gcd(abs(num0), den0) AS VARCHAR) || '/' ||
        |            CAST(den0 // gcd(abs(num0), den0) AS VARCHAR) END AS fjson
        |FROM r""".stripMargin,

    "m_mp4_info" ->
      """SELECT doc_id,
        |  CAST((doc_id % 3 + 1) * 600 AS INT) AS timescale,
        |  CAST(doc_id % 9000 + 1000 AS BIGINT) AS duration,
        |  CAST((doc_id % 9000 + 1000) * 1000 //
        |    ((doc_id % 3 + 1) * 600) AS BIGINT) AS duration_ms,
        |  CAST((doc_id % 100 + 10) + (doc_id % 50 + 5) AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,

    "m_flac_info" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 4000 AS INT) AS sample_rate,
        |  CAST(doc_id % 2 + 1 AS INT) AS channels,
        |  CAST(16 AS INT) AS bits_per_sample,
        |  CAST((doc_id % 1000 + 1) * 4096 AS BIGINT) AS total_samples,
        |  CAST((doc_id % 1000 + 1) * 4096 * 1000 //
        |    (8000 + (doc_id % 8) * 4000) AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    "m_mp3_info" ->
      """WITH m AS (SELECT doc_id,
        |  CASE CAST(doc_id % 14 + 1 AS INT)
        |    WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
        |    WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
        |    WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
        |    WHEN 12 THEN 224 WHEN 13 THEN 256 WHEN 14 THEN 320 END AS br,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 44100 WHEN 1 THEN 48000
        |    ELSE 32000 END AS sr,
        |  4 + doc_id % 512 AS nbytes,
        |  doc_id % 5000 + 1 AS vfr
        |  FROM documents)
        |SELECT doc_id, CAST(10 AS INT) AS version_x10,
        |  CAST(br AS INT) AS bitrate_kbps, CAST(sr AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN nbytes * 8 // br
        |       ELSE vfr * 1152000 // sr END AS BIGINT) AS duration_ms
        |FROM m""".stripMargin,

    "m_wav_info" ->
      """SELECT doc_id,
        |  CAST(8000 + (doc_id % 8) * 4000 AS INT) AS sample_rate,
        |  CAST(doc_id % 2 + 1 AS INT) AS channels,
        |  CAST((8000 + (doc_id % 8) * 4000) * (doc_id % 2 + 1) * 2 AS INT) AS byte_rate,
        |  CAST(((doc_id % 1000 + 1) * 256) * 1000 //
        |    ((8000 + (doc_id % 8) * 4000) * (doc_id % 2 + 1) * 2) AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,

    // the engine walked every PCM sample; the oracle replays the square
    // wave's stats in closed form (amplitude A, n2 frames, ch channels:
    // sum_abs = n2*ch*A, both half-cycles clip when A saturates)
    "m_audio_pcm" ->
      """SELECT doc_id,
        |  CAST(doc_id % 2 + 1 AS INT) AS channels,
        |  CAST(8000 + (doc_id % 8) * 4000 AS INT) AS sample_rate,
        |  (doc_id % 50 + 1) * 2 AS n_frames,
        |  (doc_id % 50 + 1) * 2 * (doc_id % 2 + 1) * a AS sum_abs,
        |  CAST(a AS BIGINT) AS peak,
        |  CAST(CASE WHEN a = 32767
        |    THEN (doc_id % 50 + 1) * 2 * (doc_id % 2 + 1)
        |    ELSE 0 END AS BIGINT) AS n_clipped,
        |  (doc_id % 50 + 1) * 2 * (doc_id % 2 + 1) * a * a AS sum_sq,
        |  CAST(CASE WHEN a = 0 THEN 0
        |    ELSE ((doc_id % 50 + 1) * 2 - 1) * (doc_id % 2 + 1)
        |    END AS BIGINT) AS zero_crossings,
        |  CAST(16 AS INT) AS bps
        |FROM (SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN 32767
        |  ELSE (doc_id * 37) % 32767 END AS a FROM documents)""".stripMargin,

    // flac CONSTANT frames: every sample is the per-doc amplitude (or its
    // negation on channel 2), so the lossless decode replays in closed form
    "m_audio_flac" ->
      """SELECT doc_id,
        |  CAST(doc_id % 2 + 1 AS INT) AS channels,
        |  CAST(8000 + (doc_id % 8) * 4000 AS INT) AS sample_rate,
        |  (doc_id % 100 + 1) * 16 AS n_frames,
        |  (doc_id % 100 + 1) * 16 * (doc_id % 2 + 1) * a AS sum_abs,
        |  CAST(a AS BIGINT) AS peak,
        |  CAST(CASE WHEN a = 32767
        |    THEN (doc_id % 100 + 1) * 16 * (doc_id % 2 + 1)
        |    ELSE 0 END AS BIGINT) AS n_clipped,
        |  (doc_id % 100 + 1) * 16 * (doc_id % 2 + 1) * a * a AS sum_sq,
        |  CAST(0 AS BIGINT) AS zero_crossings,
        |  CAST(16 AS INT) AS bps
        |FROM (SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN 32767
        |  ELSE (doc_id * 37) % 32767 END AS a FROM documents)""".stripMargin,

    // G.711 expansion is stateless per byte, so the oracle replays the
    // published mu-law/A-law decode FORMULAS themselves (complement /
    // XOR-0x55, mantissa-exponent expand, re-bias) and the square-wave
    // stats in closed form — an independent re-decode of the lossy codec
    "m_audio_g711" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 128 AS v,
        |    (doc_id // 2) % 2 + 1 AS ch,
        |    8000 * ((doc_id // 3) % 2 + 1) AS sr,
        |    doc_id % 40 + 1 AS half,
        |    CASE WHEN doc_id % 2 = 0 THEN 'ulaw' ELSE 'alaw' END AS law
        |  FROM documents
        |), b AS (
        |  SELECT p.*, bno, CASE bno WHEN 1 THEN v ELSE v + 128 END AS byte
        |  FROM p, (VALUES (1), (2)) t(bno)
        |), e AS (
        |  SELECT doc_id, bno, law, 255 - byte AS ub, xor(byte, 85) AS ab
        |  FROM b
        |), sdec AS (
        |  SELECT doc_id, bno,
        |    CASE WHEN law = 'ulaw' THEN
        |      CASE WHEN ub >= 128
        |        THEN 132 - ((ub % 16) * 8 + 132) * (1 << ((ub // 16) % 8))
        |        ELSE ((ub % 16) * 8 + 132) * (1 << ((ub // 16) % 8)) - 132
        |      END
        |    ELSE
        |      (CASE WHEN ab >= 128 THEN 1 ELSE -1 END) *
        |      (CASE WHEN (ab // 16) % 8 = 0 THEN (ab % 16) * 16 + 8
        |            WHEN (ab // 16) % 8 = 1 THEN (ab % 16) * 16 + 264
        |            ELSE ((ab % 16) * 16 + 264) * (1 << ((ab // 16) % 8 - 1))
        |       END)
        |    END AS s
        |  FROM e
        |), sv AS (
        |  SELECT doc_id,
        |    MAX(CASE WHEN bno = 1 THEN s END) AS s1,
        |    MAX(CASE WHEN bno = 2 THEN s END) AS s2
        |  FROM sdec GROUP BY doc_id
        |)
        |SELECT p.doc_id, law,
        |  CAST(ch AS INT) AS channels,
        |  CAST(sr AS INT) AS sample_rate,
        |  CAST(2 * half AS BIGINT) AS n_frames,
        |  CAST(half * ch * (abs(s1) + abs(s2)) AS BIGINT) AS sum_abs,
        |  CAST(greatest(abs(s1), abs(s2)) AS BIGINT) AS peak,
        |  CAST(half * ch * (CASE WHEN abs(s1) >= 32767 THEN 1 ELSE 0 END
        |    + CASE WHEN abs(s2) >= 32767 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  CAST(half * ch * (s1 * s1 + s2 * s2) AS BIGINT) AS sum_sq,
        |  CAST(CASE WHEN (s1 < 0) <> (s2 < 0) THEN (2 * half - 1) * ch
        |    ELSE 0 END AS BIGINT) AS zero_crossings,
        |  CAST(16 AS INT) AS bps
        |FROM p JOIN sv USING (doc_id)""".stripMargin,

    // IMA ADPCM is STATEFUL (adaptive step-size walk), so the oracle is
    // a recursive CTE replaying the published IMA recurrence — step
    // table lookup, vpdiff accumulate, s16 predictor clamp, 0..88 index
    // clamp — nibble by nibble, then aggregates the decoded samples.
    // A genuinely independent re-decode, not a closed-form shortcut.
    "m_audio_adpcm" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id,
        |    (doc_id * 97) % 4096 - 2048 AS pred0,
        |    doc_id % 89 AS idx0,
        |    (doc_id % 16 + 4) * 2 AS nsteps,
        |    8000 + (doc_id % 8) * 4000 AS sr
        |  FROM documents
        |), dec(doc_id, k, pred, idx) AS (
        |  SELECT doc_id, 0, pred0, idx0 FROM p
        |  UNION ALL
        |  SELECT doc_id, k + 1,
        |    LEAST(32767, GREATEST(-32768,
        |      CASE WHEN nib >= 8 THEN pred - vp ELSE pred + vp END)),
        |    LEAST(88, GREATEST(0, idx +
        |      CASE WHEN nib % 8 = 4 THEN 2 WHEN nib % 8 = 5 THEN 4
        |           WHEN nib % 8 = 6 THEN 6 WHEN nib % 8 = 7 THEN 8
        |           ELSE -1 END))
        |  FROM (
        |    SELECT x.*, st // 8 + (nib // 4 % 2) * st
        |      + (nib // 2 % 2) * (st // 2) + (nib % 2) * (st // 4) AS vp
        |    FROM (
        |      SELECT d.doc_id, d.k, d.pred, d.idx,
        |        (d.doc_id * 7 + d.k * 3) % 16 AS nib,
        |        ([7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,
        |          45,50,55,60,66,73,80,88,97,107,118,130,143,157,173,190,
        |          209,230,253,279,307,337,371,408,449,494,544,598,658,724,
        |          796,876,963,1060,1166,1282,1411,1552,1707,1878,2066,2272,
        |          2499,2749,3024,3327,3660,4026,4428,4871,5358,5894,6484,
        |          7132,7845,8630,9493,10442,11487,12635,13899,15289,16818,
        |          18500,20350,22385,24623,27086,29794,32767])[d.idx + 1]
        |          AS st
        |      FROM dec d JOIN p p2 USING (doc_id)
        |      WHERE d.k < p2.nsteps
        |    ) x
        |  ) y
        |), zcs AS (
        |  SELECT doc_id, k, pred AS s,
        |    CASE WHEN lag(pred) OVER (PARTITION BY doc_id ORDER BY k)
        |        IS NOT NULL
        |      AND (pred < 0) <>
        |        (lag(pred) OVER (PARTITION BY doc_id ORDER BY k) < 0)
        |      THEN 1 ELSE 0 END AS zc
        |  FROM dec
        |)
        |SELECT z.doc_id,
        |  CAST(1 AS INT) AS channels,
        |  CAST(sr AS INT) AS sample_rate,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
        |  CAST(MAX(ABS(s)) AS BIGINT) AS peak,
        |  CAST(SUM(CASE WHEN ABS(s) >= 32767 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  CAST(SUM(s * s) AS BIGINT) AS sum_sq,
        |  CAST(SUM(zc) AS BIGINT) AS zero_crossings,
        |  CAST(16 AS INT) AS bps
        |FROM zcs z JOIN p USING (doc_id)
        |GROUP BY z.doc_id, sr""".stripMargin,

    // AVI/MJPEG: container geometry is doc arithmetic; each decoded
    // frame is the solid gray 128 +/- dc (exact by T.81 with Q=8), so
    // the per-frame unnest + aggregate replays the cross-frame moment
    // accumulation the native demux performs
    "m_video_avi" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    (doc_id % 4 + 1) * 8 AS jw,
        |    (doc_id % 3 + 1) * 8 AS jh,
        |    doc_id % 4 + 2 AS f,
        |    (doc_id % 3 + 1) * 20000 AS upf
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, unnest(range(0, f)) AS f0 FROM p
        |), g AS (
        |  SELECT fr.doc_id,
        |    CASE WHEN (fr.doc_id + f0) % 2 = 0
        |      THEN 128 + ((fr.doc_id * 3 + f0 * 5) % 64 + 64)
        |      ELSE 128 - ((fr.doc_id * 3 + f0 * 5) % 64 + 64) END AS gray
        |  FROM fr
        |), a AS (
        |  SELECT doc_id, SUM(gray) AS sg, SUM(gray * gray) AS sq,
        |    MIN(gray) AS mn, MAX(gray) AS mx
        |  FROM g GROUP BY doc_id
        |)
        |SELECT p.doc_id,
        |  CAST(jw AS BIGINT) AS width,
        |  CAST(jh AS BIGINT) AS height,
        |  CAST(upf AS BIGINT) AS us_per_frame,
        |  CAST(f AS BIGINT) AS total_frames,
        |  CAST(f AS BIGINT) AS n_frames,
        |  CAST(sg * jw * jh AS BIGINT) AS sum_r,
        |  CAST(sg * jw * jh AS BIGINT) AS sum_g,
        |  CAST(sg * jw * jh AS BIGINT) AS sum_b,
        |  CAST(f * jw * jh AS BIGINT) AS n_px,
        |  CAST(mn AS BIGINT) AS min_ch,
        |  CAST(mx AS BIGINT) AS max_ch,
        |  CAST(sq * jw * jh AS BIGINT) AS sq_r,
        |  CAST(sq * jw * jh AS BIGINT) AS sq_g,
        |  CAST(sq * jw * jh AS BIGINT) AS sq_b,
        |  CAST((f * upf) // 1000 AS BIGINT) AS duration_ms
        |FROM p JOIN a USING (doc_id)""".stripMargin,

    // scene cuts: each frame's gray is closed-form (192 + scene hash),
    // the detector is the same lag-window arithmetic, so cut decisions
    // and running scene ids replay exactly
    "m_scene_cuts" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    (doc_id % 2 + 1) * 8 AS jw,
        |    doc_id % 4 + 6 AS f,
        |    doc_id % 2 + 2 AS rl
        |  FROM documents
        |), fr AS (
        |  SELECT doc_id, jw, rl, unnest(range(0, f)) AS f0 FROM p
        |), g AS (
        |  SELECT doc_id, f0 AS frame_idx, jw * 8 AS n_px,
        |    (192 + (doc_id * 3 + (f0 // rl) * 17) % 64) * 3 * jw * 8
        |      AS sum_rgb
        |  FROM fr
        |), d AS (
        |  SELECT doc_id, frame_idx, sum_rgb, n_px,
        |    CASE WHEN lag(sum_rgb) OVER w IS NULL THEN 0
        |         WHEN abs(sum_rgb - lag(sum_rgb) OVER w) > 12 * n_px
        |           THEN 1
        |         ELSE 0 END AS is_cut
        |  FROM g WINDOW w AS (PARTITION BY doc_id ORDER BY frame_idx)
        |)
        |SELECT doc_id,
        |  CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(sum_rgb AS BIGINT) AS sum_rgb,
        |  CAST(n_px AS BIGINT) AS n_px,
        |  CAST(is_cut AS INT) AS is_cut,
        |  CAST(SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY frame_idx)
        |    AS BIGINT) AS scene_id
        |FROM d""".stripMargin,

    // frame dedup: 16 possible gray levels over fixed 8x8 geometry, so
    // identical fingerprints ARE bit-identical frames; the oracle
    // replays the gray closed-form and the same corpus-wide group-by
    "m_frame_dedup" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 3 + 3 AS f FROM documents
        |), fr AS (
        |  SELECT doc_id, unnest(range(0, f)) AS f0 FROM p
        |), g AS (
        |  SELECT doc_id,
        |    (192 + ((doc_id + f0 * 7) % 16) * 4) * 3 * 64 AS sum_rgb
        |  FROM fr
        |)
        |SELECT CAST(sum_rgb AS BIGINT) AS sum_rgb,
        |  CAST(64 AS BIGINT) AS n_px,
        |  CAST(COUNT(*) AS BIGINT) AS n_frames,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_clips
        |FROM g GROUP BY sum_rgb HAVING COUNT(*) > 1""".stripMargin,

    // WARC: record geometry (content lengths incl. the HTTP envelope),
    // status/type dispatch and per-record body sha256 all replay
    // closed-form; the gzip wrapping is transparent to the fields
    "w_warc" ->
      """WITH p AS (
        |  SELECT doc_id, lpad(CAST(doc_id AS VARCHAR), 8, '0') AS lp,
        |    doc_id % 5 + 1 AS k, doc_id % 2 = 1 AS comp
        |  FROM documents
        |), recs AS (
        |  SELECT doc_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
        |    CAST(NULL AS VARCHAR) AS target_uri,
        |    CAST(17 AS BIGINT) AS content_length,
        |    -1 AS http_status, CAST(NULL AS VARCHAR) AS content_type,
        |    CAST(17 AS BIGINT) AS body_len,
        |    sha256('software: graft' || chr(13) || chr(10))
        |      AS body_sha256,
        |    comp FROM p
        |  UNION ALL
        |  SELECT doc_id, r + 1, 'response',
        |    'https://ex.org/' || lp || '/' || CAST(r AS VARCHAR),
        |    CAST((CASE WHEN r = 0 THEN 17 ELSE 24 END) + 48
        |      + 10 * (k + r) AS BIGINT),
        |    CASE WHEN r = 0 THEN 200 ELSE 404 END,
        |    'text/plain',
        |    CAST(10 * (k + r) AS BIGINT),
        |    sha256(repeat('w' || lp || ' ', CAST(k + r AS INT))),
        |    comp
        |  FROM p, (VALUES (0), (1)) t(r)
        |)
        |SELECT doc_id AS shard_id,
        |  CAST(rec_idx AS INT) AS rec_idx, warc_type, target_uri,
        |  content_length, CAST(http_status AS INT) AS http_status,
        |  content_type, body_len, body_sha256,
        |  comp AS compressed
        |FROM recs""".stripMargin,

    // HTML extraction: the oracle replays the EXPECTED title / visible
    // text / links closed-form from the table columns (the synthesized
    // page is deterministic); the engine's single-pass extractor must
    // strip doctype/comment/style/script, decode the entities (&amp;
    // named, &#8212; decimal, &#x2014; hex), cut blocks at block tags,
    // collapse whitespace, and collect both anchor hrefs in order
    "w_html" ->
      """SELECT doc_id,
        |  'Doc ' || CAST(doc_id AS VARCHAR) || ' ' || chr(8212) || ' '
        |    || source AS title,
        |  'Heading & ' || CAST(doc_id AS VARCHAR) || chr(10)
        |    || text || chr(10)
        |    || 'Lang: ' || lang || ' ' || chr(8212) || ' chars: '
        |    || CAST(n_chars AS VARCHAR) || chr(10)
        |    || 'first and second' AS text,
        |  'https://ex.org/' || lpad(CAST(doc_id AS VARCHAR), 8, '0')
        |    || '/a|/rel/' || CAST(doc_id AS VARCHAR) AS links,
        |  CAST(2 AS INT) AS n_links,
        |  CAST(4 AS INT) AS n_blocks
        |FROM documents""".stripMargin,

    // URL canonicalization: per-variant closed-form answers — scheme and
    // host lowercase, default-port drop, %61->a (unreserved decode),
    // %2f->%2F (reserved escape uppercased), dot-segment removal, empty
    // path -> '/', fragment strip; mailto rows canonicalize to NULL
    "w_url" ->
      """SELECT doc_id,
        |  CASE
        |    WHEN doc_id % 7 = 0 THEN 'mailto:user@ex.org'
        |    WHEN doc_id % 6 = 0 THEN 'HTTP://EX.ORG:80/a/'
        |      || CAST(doc_id AS VARCHAR) || '/x/../b?q=1&q=2#frag'
        |    WHEN doc_id % 6 = 1 THEN 'https://Ex.Org:443/p%61th/'
        |      || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 6 = 2 THEN 'http://ex.org/%2fkeep/'
        |      || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 6 = 3 THEN 'https://user@ex.org?x=%7e'
        |    WHEN doc_id % 6 = 4 THEN 'http://ex.org/./'
        |      || CAST(doc_id AS VARCHAR) || '/./c'
        |    ELSE 'HTTPS://ex.org:8443/' || CAST(doc_id AS VARCHAR) || '#x'
        |  END AS url,
        |  CASE
        |    WHEN doc_id % 7 = 0 THEN CAST(NULL AS VARCHAR)
        |    WHEN doc_id % 6 = 0 THEN 'http://ex.org/a/'
        |      || CAST(doc_id AS VARCHAR) || '/b?q=1&q=2'
        |    WHEN doc_id % 6 = 1 THEN 'https://ex.org/path/'
        |      || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 6 = 2 THEN 'http://ex.org/%2Fkeep/'
        |      || CAST(doc_id AS VARCHAR)
        |    WHEN doc_id % 6 = 3 THEN 'https://user@ex.org/?x=~'
        |    WHEN doc_id % 6 = 4 THEN 'http://ex.org/'
        |      || CAST(doc_id AS VARCHAR) || '/c'
        |    ELSE 'https://ex.org:8443/' || CAST(doc_id AS VARCHAR)
        |  END AS canon
        |FROM documents""".stripMargin,

    // the whole WARC -> HTML -> dedup chain replays closed-form: the
    // oracle KNOWS who survives (earliest crawl per canonical URL =
    // min doc per group; one legal page corpus-wide = min doc overall),
    // each survivor's extracted text (and so its sha256 and token
    // count), and that the 404 / text-plain / spam records died — the
    // engine's record walk, gunzip, envelope parse, canonicalization,
    // markup strip, gate and both dedup tiers must all agree to match
    "w_pipeline" ->
      """WITH grp AS (
        |  SELECT doc_id // 3 AS g, min(doc_id) AS keep_doc
        |  FROM documents GROUP BY 1
        |), mains AS (
        |  SELECT keep_doc AS shard_id, CAST(1 AS INT) AS rec_idx,
        |    'http://site.org/page/' || CAST(g AS VARCHAR) AS url,
        |    'Page ' || CAST(g AS VARCHAR) AS title,
        |    CAST(g % 4 + 10 AS INT) AS n_tokens,
        |    sha256('Group ' || CAST(g AS VARCHAR) || ' says '
        |      || repeat('tok' || CAST(g AS VARCHAR) || ' ',
        |           CAST(g % 4 + 6 AS INT))
        |      || 'end.') AS text_sha256
        |  FROM grp
        |), legal AS (
        |  SELECT min(doc_id) AS shard_id, CAST(5 AS INT) AS rec_idx,
        |    'http://site.org/legal/' || CAST(min(doc_id) AS VARCHAR) AS url,
        |    'Legal' AS title, CAST(9 AS INT) AS n_tokens,
        |    sha256('terms of service apply to all pages equally forever')
        |      AS text_sha256
        |  FROM documents
        |)
        |SELECT * FROM mains UNION ALL SELECT * FROM legal""".stripMargin,

    // robots verdicts: the oracle knows every (host, variant) outcome
    // closed-form — which rule wins (longest pattern; allow beats
    // disallow on the h4 tie), the shadowed-group delays (h6's * delay
    // never applies to GraftBot), and that h7 (no robots.txt) and h2
    // (empty Disallow) allow everything — it never runs the matcher
    "w_robots" ->
      """WITH p AS (
        |  SELECT doc_id, doc_id % 8 AS h, doc_id % 6 AS v FROM documents
        |)
        |SELECT doc_id,
        |  'h' || CAST(h AS VARCHAR) AS host,
        |  CASE v
        |    WHEN 0 THEN '/private/ok'
        |    WHEN 1 THEN '/private/secret'
        |    WHEN 2 THEN '/data/tmp/file.json'
        |    WHEN 3 THEN '/a/b'
        |    WHEN 4 THEN '/end'
        |    ELSE '/x' || CAST(doc_id AS VARCHAR) || 'y/page'
        |  END AS pathq,
        |  NOT ((h = 0 AND v = 1) OR (h = 1 AND v = 2)
        |    OR (h = 3 AND v = 5) OR (h = 5 AND v = 4)) AS allowed,
        |  CASE
        |    WHEN h = 0 AND v = 0 THEN '/private/ok$'
        |    WHEN h = 0 AND v = 1 THEN '/private/'
        |    WHEN h = 1 AND v = 2 THEN '/data/tmp/'
        |    WHEN h = 3 AND v = 5 THEN '/x*y/'
        |    WHEN h = 4 AND v = 3 THEN '/a/b'
        |    WHEN h = 5 AND v = 4 THEN '/end$'
        |    WHEN h = 6 THEN '/'
        |  END AS rule,
        |  CASE
        |    WHEN (h = 0 AND v = 0) OR (h = 4 AND v = 3) OR h = 6
        |      THEN 'allow'
        |    WHEN (h = 0 AND v = 1) OR (h = 1 AND v = 2)
        |      OR (h = 3 AND v = 5) OR (h = 5 AND v = 4) THEN 'disallow'
        |  END AS rtype,
        |  CAST(CASE
        |    WHEN h = 0 AND v = 0 THEN 12
        |    WHEN h = 0 AND v = 1 THEN 9
        |    WHEN h = 1 AND v = 2 THEN 10
        |    WHEN h = 3 AND v = 5 THEN 5
        |    WHEN h = 4 AND v = 3 THEN 4
        |    WHEN h = 5 AND v = 4 THEN 5
        |    WHEN h = 6 THEN 1
        |  END AS INT) AS spec,
        |  CAST(CASE WHEN h = 0 THEN 2.0 WHEN h = 2 THEN 1.5 END
        |    AS DOUBLE) AS crawl_delay
        |FROM p""".stripMargin,

    // PageRank: the oracle replays the SAME five damped fixed-point
    // iterations in unrolled SQL over the same derived edge set — every
    // operation is exact BIGINT arithmetic (// is floor division, all
    // values non-negative), so two independent engines land on
    // bit-identical ranks
    "w_pagerank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e0 AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id AS src,
        |      (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
        |    UNION ALL
        |    SELECT doc_id, CAST(0 AS BIGINT) FROM documents
        |    WHERE doc_id % 3 = 1
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
        |    FROM documents WHERE doc_id % 5 = 2
        |  ) u WHERE src <> dst
        |),
        |outd AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
        |ed AS (SELECT e0.src, e0.dst, outd.outdeg
        |       FROM e0 JOIN outd USING (src)),
        |r0 AS (SELECT doc_id AS node, CAST(10000000000 AS BIGINT) AS rank
        |       FROM documents),
        |s1 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r0.rank // ed.outdeg) AS BIGINT) AS m
        |       FROM r0 JOIN ed ON r0.node = ed.src GROUP BY ed.dst),
        |r1 AS (SELECT d.doc_id AS node,
        |         CAST(1500000000 + (85 * COALESCE(s1.m, 0)) // 100
        |           AS BIGINT) AS rank
        |       FROM documents d LEFT JOIN s1 ON d.doc_id = s1.node),
        |s2 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r1.rank // ed.outdeg) AS BIGINT) AS m
        |       FROM r1 JOIN ed ON r1.node = ed.src GROUP BY ed.dst),
        |r2 AS (SELECT d.doc_id AS node,
        |         CAST(1500000000 + (85 * COALESCE(s2.m, 0)) // 100
        |           AS BIGINT) AS rank
        |       FROM documents d LEFT JOIN s2 ON d.doc_id = s2.node),
        |s3 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r2.rank // ed.outdeg) AS BIGINT) AS m
        |       FROM r2 JOIN ed ON r2.node = ed.src GROUP BY ed.dst),
        |r3 AS (SELECT d.doc_id AS node,
        |         CAST(1500000000 + (85 * COALESCE(s3.m, 0)) // 100
        |           AS BIGINT) AS rank
        |       FROM documents d LEFT JOIN s3 ON d.doc_id = s3.node),
        |s4 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r3.rank // ed.outdeg) AS BIGINT) AS m
        |       FROM r3 JOIN ed ON r3.node = ed.src GROUP BY ed.dst),
        |r4 AS (SELECT d.doc_id AS node,
        |         CAST(1500000000 + (85 * COALESCE(s4.m, 0)) // 100
        |           AS BIGINT) AS rank
        |       FROM documents d LEFT JOIN s4 ON d.doc_id = s4.node),
        |s5 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r4.rank // ed.outdeg) AS BIGINT) AS m
        |       FROM r4 JOIN ed ON r4.node = ed.src GROUP BY ed.dst),
        |r5 AS (SELECT d.doc_id AS node,
        |         CAST(1500000000 + (85 * COALESCE(s5.m, 0)) // 100
        |           AS BIGINT) AS rank
        |       FROM documents d LEFT JOIN s5 ON d.doc_id = s5.node)
        |SELECT node, rank FROM r5""".stripMargin,

    // host graph: one aggregation, self-edges dropped
    "w_hostgraph" ->
      """SELECT 'h' || CAST(doc_id % 5 AS VARCHAR) AS src_host,
        |  'h' || CAST((doc_id * 3 + 1) % 7 AS VARCHAR) AS dst_host,
        |  count(*) AS n_links
        |FROM documents
        |WHERE doc_id % 5 <> (doc_id * 3 + 1) % 7
        |GROUP BY 1, 2""".stripMargin,

    // sitemap entries: the oracle KNOWS each variant's parsed rows
    // closed-form (entity decoded, CDATA raw, invalid priority and
    // invalid calendar day null, upper-case changefreq lowered, the
    // malformed v=3 docs contributing nothing) — it never parses XML
    "w_sitemap" ->
      """WITH p AS (
        |  SELECT doc_id AS d,
        |    'h' || CAST(doc_id % 8 AS VARCHAR) || '.example' AS host,
        |    doc_id % 4 AS v
        |  FROM documents
        |)
        |SELECT host, 'url' AS kind,
        |  'https://' || host || '/p' || CAST(d AS VARCHAR) || 'a' AS loc,
        |  '2024-01-15' AS lastmod, '2024-01-15' AS lastmod_day,
        |  'daily' AS changefreq, CAST(500 AS INT) AS priority_milli
        |FROM p WHERE v = 0
        |UNION ALL
        |SELECT host, 'url',
        |  'https://' || host || '/p' || CAST(d AS VARCHAR) || 'b?x=1&y=2',
        |  NULL, NULL, NULL, CAST(1000 AS INT)
        |FROM p WHERE v = 0
        |UNION ALL
        |SELECT host, 'sitemap',
        |  'https://' || host || '/sm' || CAST(d AS VARCHAR) || '.xml',
        |  '2024-02-30T10:00:00Z', NULL, NULL, NULL
        |FROM p WHERE v = 1
        |UNION ALL
        |SELECT host, 'url',
        |  'https://' || host || '/c' || CAST(d AS VARCHAR) || '?a=1&b=2',
        |  '2023-12-01T08:30:00+02:00', '2023-12-01', 'weekly', NULL
        |FROM p WHERE v = 2""".stripMargin,

    // frontier schedule: independent replay — SQL window row_number
    // instead of the bounded heap, the same md5-60-bit shard hash, the
    // same exact integer politeness arithmetic
    "w_frontier" ->
      """WITH c AS (
        |  SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) AS host,
        |    doc_id AS page_id, (doc_id * 31 + 7) % 1000 AS weight
        |  FROM documents
        |),
        |r AS (
        |  SELECT host, page_id, weight,
        |    row_number() OVER (PARTITION BY host
        |      ORDER BY weight DESC, page_id ASC) - 1 AS slot
        |  FROM c
        |),
        |q AS (SELECT * FROM r WHERE slot < 5),
        |dl AS (
        |  SELECT 'h' || CAST(k AS VARCHAR) AS host,
        |    k * 1000 + 500 AS delay_ms
        |  FROM range(40) t(k) WHERE k % 3 = 0
        |)
        |SELECT q.host,
        |  CAST(concat('0x', substr(md5(q.host), 1, 15)) AS BIGINT) % 8
        |    AS shard,
        |  CAST(q.slot AS INT) AS slot, q.page_id, q.weight,
        |  COALESCE(dl.delay_ms, 1000) AS delay_ms,
        |  q.slot * COALESCE(dl.delay_ms, 1000) AS fetch_offset_ms
        |FROM q LEFT JOIN dl ON q.host = dl.host""".stripMargin,

    // anchor text per canonical target: the oracle KNOWS the extracted
    // (target, anchor) pairs closed-form — host lowered, :443 dropped,
    // %7E -> ~, &amp; decoded in the text, the <b> inline tag gone —
    // and replays only the aggregation
    "w_anchors" ->
      """WITH p AS (
        |  SELECT doc_id AS d, doc_id % 50 AS k, doc_id % 7 AS m
        |  FROM documents
        |),
        |a AS (
        |  SELECT 'https://t' || CAST(k AS VARCHAR) || '.example/home'
        |      AS target,
        |    'Home of ' || CAST(k AS VARCHAR) AS anchor
        |  FROM p
        |  UNION ALL
        |  SELECT 'https://t' || CAST(k AS VARCHAR) || '.example/home',
        |    'Site&' || CAST(k AS VARCHAR)
        |  FROM p
        |  UNION ALL
        |  SELECT 'https://other' || CAST(m AS VARCHAR) || '.example/x~y',
        |    'ref ' || CAST(d AS VARCHAR)
        |  FROM p
        |)
        |SELECT target, CAST(count(*) AS BIGINT) AS n_refs,
        |  CAST(count(DISTINCT anchor) AS BIGINT) AS n_texts,
        |  min(anchor) AS first_anchor
        |FROM a GROUP BY target""".stripMargin,

    // HITS: the oracle replays the SAME three I-then-O fixed-point
    // rounds in unrolled SQL over the same derived edge set — sums in
    // HUGEINT, the L-infinity renormalize is `raw * 1e6 // max(raw)`
    // (// is floor division, all values non-negative), so two
    // independent engines land on bit-identical hub/authority scores
    "w_hits" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS MATERIALIZED (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id AS src,
        |      (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
        |    UNION ALL
        |    SELECT doc_id, CAST(0 AS BIGINT) FROM documents
        |    WHERE doc_id % 3 = 1
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
        |    FROM documents WHERE doc_id % 5 = 2
        |  ) u WHERE src <> dst
        |),
        |h0 AS (SELECT doc_id AS node, CAST(1000000 AS BIGINT) AS hub
        |       FROM documents),
        |ar1 AS MATERIALIZED (SELECT e.dst AS node, SUM(h0.hub) AS m
        |        FROM h0 JOIN e ON h0.node = e.src GROUP BY e.dst),
        |a1 AS MATERIALIZED (SELECT d.doc_id AS node, CAST(COALESCE(ar1.m * 1000000
        |         // NULLIF((SELECT MAX(m) FROM ar1), 0), 0) AS BIGINT)
        |         AS auth
        |       FROM documents d LEFT JOIN ar1 ON d.doc_id = ar1.node),
        |hr1 AS MATERIALIZED (SELECT e.src AS node, SUM(a1.auth) AS m
        |        FROM a1 JOIN e ON a1.node = e.dst GROUP BY e.src),
        |h1 AS MATERIALIZED (SELECT d.doc_id AS node, CAST(COALESCE(hr1.m * 1000000
        |         // NULLIF((SELECT MAX(m) FROM hr1), 0), 0) AS BIGINT)
        |         AS hub
        |       FROM documents d LEFT JOIN hr1 ON d.doc_id = hr1.node),
        |ar2 AS MATERIALIZED (SELECT e.dst AS node, SUM(h1.hub) AS m
        |        FROM h1 JOIN e ON h1.node = e.src GROUP BY e.dst),
        |a2 AS MATERIALIZED (SELECT d.doc_id AS node, CAST(COALESCE(ar2.m * 1000000
        |         // NULLIF((SELECT MAX(m) FROM ar2), 0), 0) AS BIGINT)
        |         AS auth
        |       FROM documents d LEFT JOIN ar2 ON d.doc_id = ar2.node),
        |hr2 AS MATERIALIZED (SELECT e.src AS node, SUM(a2.auth) AS m
        |        FROM a2 JOIN e ON a2.node = e.dst GROUP BY e.src),
        |h2 AS MATERIALIZED (SELECT d.doc_id AS node, CAST(COALESCE(hr2.m * 1000000
        |         // NULLIF((SELECT MAX(m) FROM hr2), 0), 0) AS BIGINT)
        |         AS hub
        |       FROM documents d LEFT JOIN hr2 ON d.doc_id = hr2.node),
        |ar3 AS MATERIALIZED (SELECT e.dst AS node, SUM(h2.hub) AS m
        |        FROM h2 JOIN e ON h2.node = e.src GROUP BY e.dst),
        |a3 AS MATERIALIZED (SELECT d.doc_id AS node, CAST(COALESCE(ar3.m * 1000000
        |         // NULLIF((SELECT MAX(m) FROM ar3), 0), 0) AS BIGINT)
        |         AS auth
        |       FROM documents d LEFT JOIN ar3 ON d.doc_id = ar3.node),
        |hr3 AS MATERIALIZED (SELECT e.src AS node, SUM(a3.auth) AS m
        |        FROM a3 JOIN e ON a3.node = e.dst GROUP BY e.src),
        |h3 AS MATERIALIZED (SELECT d.doc_id AS node, CAST(COALESCE(hr3.m * 1000000
        |         // NULLIF((SELECT MAX(m) FROM hr3), 0), 0) AS BIGINT)
        |         AS hub
        |       FROM documents d LEFT JOIN hr3 ON d.doc_id = hr3.node)
        |SELECT a3.node, a3.auth, h3.hub
        |FROM a3 JOIN h3 ON a3.node = h3.node""".stripMargin,

    // TrustRank: the oracle replays the same four seeded fixed-point
    // rounds as unrolled SQL — seed teleport 15% of 1e10, damped sum
    // in exact integer floor arithmetic, identical to the w_pagerank
    // discipline with the teleport vector restricted to the seeds
    "w_trustrank" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e0 AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT doc_id AS src,
        |      (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
        |    UNION ALL
        |    SELECT doc_id, CAST(0 AS BIGINT) FROM documents
        |    WHERE doc_id % 3 = 1
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
        |    FROM documents WHERE doc_id % 5 = 2
        |  ) u WHERE src <> dst
        |),
        |outd AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
        |ed AS MATERIALIZED (SELECT e0.src, e0.dst, outd.outdeg
        |       FROM e0 JOIN outd USING (src)),
        |n0 AS MATERIALIZED (SELECT d.doc_id AS node,
        |         CASE WHEN d.doc_id % 17 = 0
        |           THEN CAST(1500000000 AS BIGINT)
        |           ELSE CAST(0 AS BIGINT) END AS tele
        |       FROM documents d),
        |r0 AS (SELECT node, CASE WHEN tele > 0
        |         THEN CAST(10000000000 AS BIGINT)
        |         ELSE CAST(0 AS BIGINT) END AS trust FROM n0),
        |s1 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r0.trust // ed.outdeg) AS BIGINT) AS m
        |       FROM r0 JOIN ed ON r0.node = ed.src GROUP BY ed.dst),
        |r1 AS (SELECT n0.node,
        |         CAST(n0.tele + (85 * COALESCE(s1.m, 0)) // 100
        |           AS BIGINT) AS trust
        |       FROM n0 LEFT JOIN s1 ON n0.node = s1.node),
        |s2 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r1.trust // ed.outdeg) AS BIGINT) AS m
        |       FROM r1 JOIN ed ON r1.node = ed.src GROUP BY ed.dst),
        |r2 AS (SELECT n0.node,
        |         CAST(n0.tele + (85 * COALESCE(s2.m, 0)) // 100
        |           AS BIGINT) AS trust
        |       FROM n0 LEFT JOIN s2 ON n0.node = s2.node),
        |s3 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r2.trust // ed.outdeg) AS BIGINT) AS m
        |       FROM r2 JOIN ed ON r2.node = ed.src GROUP BY ed.dst),
        |r3 AS (SELECT n0.node,
        |         CAST(n0.tele + (85 * COALESCE(s3.m, 0)) // 100
        |           AS BIGINT) AS trust
        |       FROM n0 LEFT JOIN s3 ON n0.node = s3.node),
        |s4 AS (SELECT ed.dst AS node,
        |         CAST(SUM(r3.trust // ed.outdeg) AS BIGINT) AS m
        |       FROM r3 JOIN ed ON r3.node = ed.src GROUP BY ed.dst),
        |r4 AS (SELECT n0.node,
        |         CAST(n0.tele + (85 * COALESCE(s4.m, 0)) // 100
        |           AS BIGINT) AS trust
        |       FROM n0 LEFT JOIN s4 ON n0.node = s4.node)
        |SELECT node, trust FROM r4""".stripMargin,

    // LPA: the oracle symmetrizes the same edge set and replays the
    // three synchronous rounds with count/window argmax (c DESC,
    // label ASC — the engine's min(struct(-c, label)) order)
    "w_labelprop" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e0 AS (
        |  SELECT src, dst FROM (
        |    SELECT doc_id AS src,
        |      (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
        |    UNION ALL
        |    SELECT doc_id, CAST(0 AS BIGINT) FROM documents
        |    WHERE doc_id % 3 = 1
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
        |    FROM documents WHERE doc_id % 5 = 2
        |  ) u WHERE src <> dst
        |),
        |eu AS MATERIALIZED (
        |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |l0 AS (SELECT doc_id AS node, doc_id AS label FROM documents),
        |c1 AS (SELECT e.dst AS node, l0.label, count(*) AS c
        |       FROM l0 JOIN eu e ON l0.node = e.src
        |       GROUP BY e.dst, l0.label),
        |p1 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (
        |           PARTITION BY node ORDER BY c DESC, label) AS rn
        |         FROM c1) WHERE rn = 1),
        |l1 AS (SELECT d.doc_id AS node,
        |         COALESCE(p1.label, d.doc_id) AS label
        |       FROM documents d LEFT JOIN p1 ON d.doc_id = p1.node),
        |c2 AS (SELECT e.dst AS node, l1.label, count(*) AS c
        |       FROM l1 JOIN eu e ON l1.node = e.src
        |       GROUP BY e.dst, l1.label),
        |p2 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (
        |           PARTITION BY node ORDER BY c DESC, label) AS rn
        |         FROM c2) WHERE rn = 1),
        |l2 AS (SELECT d.doc_id AS node,
        |         COALESCE(p2.label, d.doc_id) AS label
        |       FROM documents d LEFT JOIN p2 ON d.doc_id = p2.node),
        |c3 AS (SELECT e.dst AS node, l2.label, count(*) AS c
        |       FROM l2 JOIN eu e ON l2.node = e.src
        |       GROUP BY e.dst, l2.label),
        |p3 AS (SELECT node, label FROM (
        |         SELECT node, label, row_number() OVER (
        |           PARTITION BY node ORDER BY c DESC, label) AS rn
        |         FROM c3) WHERE rn = 1),
        |l3 AS (SELECT d.doc_id AS node,
        |         COALESCE(p3.label, d.doc_id) AS label
        |       FROM documents d LEFT JOIN p3 ON d.doc_id = p3.node)
        |SELECT node, label FROM l3""".stripMargin,

    // triangles: the oracle canonicalizes, orients by (degree, id),
    // and replays wedge + closure joins; per-node counts by exploding
    // each triangle to its three corners
    "w_triangles" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |raw AS (
        |  SELECT src, dst FROM (
        |    SELECT doc_id AS src,
        |      (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
        |    UNION ALL
        |    SELECT doc_id, CAST(0 AS BIGINT) FROM documents
        |    WHERE doc_id % 3 = 1
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
        |    FROM documents WHERE doc_id % 5 = 2
        |  ) u WHERE src <> dst
        |),
        |ec AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM raw),
        |deg AS MATERIALIZED (
        |  SELECT node, count(*) AS degree FROM (
        |    SELECT a AS node FROM ec UNION ALL SELECT b FROM ec)
        |  GROUP BY node),
        |o AS MATERIALIZED (
        |  SELECT CASE WHEN da.degree < db.degree
        |           OR (da.degree = db.degree AND ec.a < ec.b)
        |         THEN ec.a ELSE ec.b END AS u,
        |         CASE WHEN da.degree < db.degree
        |           OR (da.degree = db.degree AND ec.a < ec.b)
        |         THEN ec.b ELSE ec.a END AS v,
        |         CASE WHEN da.degree < db.degree
        |           OR (da.degree = db.degree AND ec.a < ec.b)
        |         THEN db.degree ELSE da.degree END AS dv
        |  FROM ec
        |  JOIN deg da ON ec.a = da.node
        |  JOIN deg db ON ec.b = db.node),
        |tri AS (SELECT o1.u, o1.v AS v1, o2.v AS v2
        |        FROM o o1 JOIN o o2 ON o1.u = o2.u
        |          AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
        |        JOIN o oe ON oe.u = o1.v AND oe.v = o2.v),
        |pn AS (SELECT node, count(*) AS n_tri FROM (
        |         SELECT u AS node FROM tri
        |         UNION ALL SELECT v1 FROM tri
        |         UNION ALL SELECT v2 FROM tri) GROUP BY node)
        |SELECT d.doc_id AS node,
        |  CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
        |  CAST(COALESCE(pn.n_tri, 0) AS BIGINT) AS n_tri
        |FROM documents d
        |LEFT JOIN deg ON d.doc_id = deg.node
        |LEFT JOIN pn ON d.doc_id = pn.node""".stripMargin,

    // 3-core: the oracle unrolls 12 peeling rounds (generated — each
    // round recomputes surviving degrees and semi-joins the edge set
    // down); the k-core is a unique fixpoint, so engine-to-convergence
    // equals oracle-at-12 iff peeling finishes within 12 rounds, which
    // the three-scale compare enforces
    "w_kcore" -> {
      val rounds = (1 to 12).map { i =>
        val prev = if (i == 1) "ec0" else s"ec${i - 1}"
        s"""d$i AS (SELECT node, count(*) AS dg FROM (
           |    SELECT a AS node FROM $prev UNION ALL
           |    SELECT b FROM $prev) GROUP BY node),
           |al$i AS MATERIALIZED (SELECT node FROM d$i WHERE dg >= 3),
           |ec$i AS MATERIALIZED (
           |  SELECT e.a, e.b FROM $prev e
           |  JOIN al$i x ON e.a = x.node
           |  JOIN al$i y ON e.b = y.node),""".stripMargin
      }.mkString("\n")
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |mm AS (SELECT (SELECT n FROM nn) // 5 AS m),
         |raw AS (
         |  SELECT src, dst FROM (
         |    SELECT doc_id AS src,
         |      (doc_id + 1) % (SELECT n FROM nn) AS dst FROM documents
         |    UNION ALL
         |    SELECT doc_id, CAST(0 AS BIGINT) FROM documents
         |    WHERE doc_id % 3 = 1
         |    UNION ALL
         |    SELECT doc_id, (doc_id * 7 + 3) % (SELECT n FROM nn)
         |    FROM documents WHERE doc_id % 5 = 2
         |    UNION ALL
         |    SELECT doc_id, (doc_id + 1) % (SELECT m FROM mm)
         |    FROM documents WHERE doc_id < (SELECT m FROM mm)
         |    UNION ALL
         |    SELECT doc_id, (doc_id + 2) % (SELECT m FROM mm)
         |    FROM documents WHERE doc_id < (SELECT m FROM mm)
         |    UNION ALL
         |    SELECT doc_id, (doc_id + 3) % (SELECT m FROM mm)
         |    FROM documents WHERE doc_id < (SELECT m FROM mm)
         |  ) u WHERE src <> dst
         |),
         |ec0 AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM raw),
         |$rounds
         |core AS (SELECT DISTINCT node FROM (
         |  SELECT a AS node FROM ec12 UNION ALL SELECT b FROM ec12))
         |SELECT d.doc_id AS node, (c.node IS NOT NULL) AS in_kcore
         |FROM documents d LEFT JOIN core c ON d.doc_id = c.node"""
        .stripMargin
    },

    // canonical selection: recursive-CTE components (the d_components
    // oracle) + an independent window replay of the keep-longest rule
    "w_canonical" ->
      s"""WITH RECURSIVE $simhashCteSql,
         |p AS (SELECT a.doc_id id_a, b.doc_id id_b FROM sig a JOIN sig b
         |      ON a.doc_id < b.doc_id
         |      WHERE bit_count(xor(a.sig, b.sig)) <= 3),
         |e AS (SELECT id_a a, id_b b FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |n AS (SELECT DISTINCT a AS id FROM e),
         |reach(id, r) AS (
         |  SELECT id, id FROM n
         |  UNION
         |  SELECT e.b, reach.r FROM e JOIN reach ON e.a = reach.id
         |),
         |comp AS (SELECT id, CAST(min(r) AS BIGINT) AS component
         |         FROM reach GROUP BY id),
         |wc AS (SELECT d.doc_id,
         |         COALESCE(c.component, d.doc_id) AS component,
         |         CAST(length(d.text) AS BIGINT) AS n_chars
         |       FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
         |cn AS (SELECT component, doc_id AS canonical_id FROM (
         |         SELECT component, doc_id, row_number() OVER (
         |           PARTITION BY component
         |           ORDER BY n_chars DESC, doc_id) AS rn FROM wc)
         |       WHERE rn = 1)
         |SELECT wc.doc_id, wc.component, wc.n_chars, cn.canonical_id,
         |  wc.doc_id = cn.canonical_id AS keep
         |FROM wc JOIN cn USING (component)""".stripMargin,

    // inverted index: the oracle re-derives the postings with a window
    // (tf DESC, doc_id ASC — the TopK heap's exact order) and keeps
    // rank <= 3; df/cf re-aggregated independently
    "w_index" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tf AS (SELECT tok, doc_id, count(*) AS tf FROM tk
        |       WHERE tok <> '' GROUP BY tok, doc_id),
        |st AS (SELECT tok, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
        |       FROM tf GROUP BY tok),
        |rk AS (SELECT tok, doc_id, tf, row_number() OVER (
        |         PARTITION BY tok ORDER BY tf DESC, doc_id) AS rank
        |       FROM tf)
        |SELECT st.tok, st.df, st.cf, rk.rank, rk.doc_id, rk.tf
        |FROM st JOIN rk ON st.tok = rk.tok WHERE rk.rank <= 3""".stripMargin,

    // BM25: the oracle recomputes the scores with the IDENTICAL
    // operand order (double addition/multiplication sequences match
    // token-for-token; ln under the PSI-oracle discipline), pins them
    // to BIGINT 1e-4 units with the same round-to-nearest, and replays
    // the top-8 heap as a window
    "w_bm25" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |tk2 AS (SELECT * FROM tk WHERE tok <> ''),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tk2 GROUP BY doc_id),
        |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
        |       FROM dl),
        |tf AS (SELECT tok, doc_id, count(*) AS tf FROM tk2
        |       WHERE tok IN ('spark', 'join', 'window')
        |       GROUP BY tok, doc_id),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |sc AS (SELECT tf.tok, tf.doc_id, CAST(round(
        |         ln((st.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
        |           * (tf.tf * 2.2)
        |           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
        |               / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))
        |           * 10000, 0) AS BIGINT) AS score_fp
        |       FROM tf
        |       JOIN dfq ON tf.tok = dfq.tok
        |       JOIN dl ON tf.doc_id = dl.doc_id
        |       CROSS JOIN st),
        |rk AS (SELECT tok, doc_id, score_fp, row_number() OVER (
        |         PARTITION BY tok ORDER BY score_fp DESC, doc_id) AS rank
        |       FROM sc)
        |SELECT tok, rank, doc_id, score_fp FROM rk
        |WHERE rank <= 8""".stripMargin,

    // the engine DECODED the synthesized PPM pixels / WAV samples and
    // computed the 8-dim color-moment / waveform-statistics embedding
    // from them; the oracle replays the moment arithmetic in closed form
    // and then the exact IEEE double sequence (every op correctly
    // rounded: +,-,*,/, sqrt, one final float32 cast) — bit-exact float
    // comparison, no tolerance
    "m_embed" ->
      """WITH im AS (
        |  SELECT doc_id, doc_id % 9 + 2 AS w, doc_id % 5 + 1 AS h,
        |    (doc_id * 11) % 256 AS ar, (doc_id * 5) % 256 AS ag,
        |    (doc_id * 3) % 256 AS ab,
        |    (doc_id * 7) % 256 AS br, (doc_id * 13) % 256 AS bg,
        |    (doc_id * 17) % 256 AS bb
        |  FROM documents WHERE doc_id % 2 = 0
        |), im2 AS (
        |  SELECT *, w * h AS n, doc_id % (w * h - 1) + 1 AS q FROM im
        |), imm AS (
        |  SELECT doc_id, w, h, n,
        |    q*ar + (n-q)*br AS sum_r, q*ag + (n-q)*bg AS sum_g,
        |    q*ab + (n-q)*bb AS sum_b,
        |    q*ar*ar + (n-q)*br*br AS sq_r, q*ag*ag + (n-q)*bg*bg AS sq_g,
        |    q*ab*ab + (n-q)*bb*bb AS sq_b,
        |    LEAST(ar, ag, ab, br, bg, bb) AS mn,
        |    GREATEST(ar, ag, ab, br, bg, bb) AS mx
        |  FROM im2
        |), imv AS (
        |  SELECT doc_id, w, h, n, mn, mx,
        |    CAST(sum_r AS DOUBLE)/n AS mu_r, CAST(sum_g AS DOUBLE)/n AS mu_g,
        |    CAST(sum_b AS DOUBLE)/n AS mu_b,
        |    CAST(sq_r AS DOUBLE)/n AS m2_r, CAST(sq_g AS DOUBLE)/n AS m2_g,
        |    CAST(sq_b AS DOUBLE)/n AS m2_b
        |  FROM imm
        |), au AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 11 = 0 THEN 32767
        |         ELSE (doc_id * 37) % 32767 END AS amp,
        |    doc_id % 50 + 1 AS half,
        |    8000 + (doc_id % 8) * 4000 AS sr
        |  FROM documents WHERE doc_id % 2 = 1
        |)
        |SELECT doc_id, 'image' AS modality,
        |  CAST(mu_r / 255.0 AS FLOAT) AS e0,
        |  CAST(mu_g / 255.0 AS FLOAT) AS e1,
        |  CAST(mu_b / 255.0 AS FLOAT) AS e2,
        |  CAST(sqrt(CASE WHEN m2_r - mu_r*mu_r > 0
        |    THEN m2_r - mu_r*mu_r ELSE 0 END) / 127.5 AS FLOAT) AS e3,
        |  CAST(sqrt(CASE WHEN m2_g - mu_g*mu_g > 0
        |    THEN m2_g - mu_g*mu_g ELSE 0 END) / 127.5 AS FLOAT) AS e4,
        |  CAST(sqrt(CASE WHEN m2_b - mu_b*mu_b > 0
        |    THEN m2_b - mu_b*mu_b ELSE 0 END) / 127.5 AS FLOAT) AS e5,
        |  CAST(CAST(w AS DOUBLE) / (w + h) AS FLOAT) AS e6,
        |  CAST(CAST(mx - mn AS DOUBLE) / 255.0 AS FLOAT) AS e7
        |FROM imv
        |UNION ALL
        |SELECT doc_id, 'audio' AS modality,
        |  CAST(CAST(amp * 4 * half AS DOUBLE) / (4 * half) / 32768.0
        |    AS FLOAT) AS e0,
        |  CAST(sqrt(CAST(4 * half * amp * amp AS DOUBLE) / (4 * half))
        |    / 32768.0 AS FLOAT) AS e1,
        |  CAST(CAST(amp AS DOUBLE) / 32768.0 AS FLOAT) AS e2,
        |  CAST(CAST(CASE WHEN amp = 0 THEN 0 ELSE 2 * (2 * half - 1) END
        |    AS DOUBLE) / (4 * half) AS FLOAT) AS e3,
        |  CAST(CAST(CASE WHEN amp = 32767 THEN 4 * half ELSE 0 END
        |    AS DOUBLE) / (4 * half) AS FLOAT) AS e4,
        |  CAST(CAST(2 * half AS DOUBLE) / sr / 600.0 AS FLOAT) AS e5,
        |  CAST(0.25 AS FLOAT) AS e6,
        |  CAST(CAST(sr AS DOUBLE) / 96000.0 AS FLOAT) AS e7
        |FROM au""".stripMargin,

    // full-chain replay of the content near-dup: closed-form pixel
    // moments -> float32 color-moment embedding -> md5 portable planes
    // -> LSH buckets -> bucket cap -> normalized in-order dots; DuckDB
    // brute-forces nothing the engine didn't — identical bucketing means
    // identical candidate sets, and bit-exact doubles mean identical
    // threshold decisions
    "m_near_dup" ->
      s"""WITH geo AS (
         |  SELECT doc_id, doc_id // 2 AS p, doc_id % 2 AS o FROM documents
         |), g1 AS (
         |  SELECT doc_id, p, p % 9 + 2 AS w, p % 5 + 1 AS h,
         |    (p * 11) % 256 AS ar, (p * 5) % 256 AS ag, (p * 3) % 256 AS ab,
         |    (p * 7) % 256 AS br, (p * 13) % 256 AS bg,
         |    (p * 17 + o) % 256 AS bb
         |  FROM geo
         |), g2 AS (
         |  SELECT *, w * h AS n, p % (w * h - 1) + 1 AS q FROM g1
         |), mm AS (
         |  SELECT doc_id, w, h, n,
         |    q*ar + (n-q)*br AS sum_r, q*ag + (n-q)*bg AS sum_g,
         |    q*ab + (n-q)*bb AS sum_b,
         |    q*ar*ar + (n-q)*br*br AS sq_r, q*ag*ag + (n-q)*bg*bg AS sq_g,
         |    q*ab*ab + (n-q)*bb*bb AS sq_b,
         |    LEAST(ar, ag, ab, br, bg, bb) AS mn,
         |    GREATEST(ar, ag, ab, br, bg, bb) AS mx
         |  FROM g2
         |), mv AS (
         |  SELECT doc_id, w, h, n, mn, mx,
         |    CAST(sum_r AS DOUBLE)/n AS mu_r, CAST(sum_g AS DOUBLE)/n AS mu_g,
         |    CAST(sum_b AS DOUBLE)/n AS mu_b,
         |    CAST(sq_r AS DOUBLE)/n AS m2_r, CAST(sq_g AS DOUBLE)/n AS m2_g,
         |    CAST(sq_b AS DOUBLE)/n AS m2_b
         |  FROM mm
         |), emb AS (
         |  SELECT doc_id AS vec_id, [
         |    CAST(CAST(mu_r / 255.0 AS FLOAT) AS DOUBLE),
         |    CAST(CAST(mu_g / 255.0 AS FLOAT) AS DOUBLE),
         |    CAST(CAST(mu_b / 255.0 AS FLOAT) AS DOUBLE),
         |    CAST(CAST(sqrt(CASE WHEN m2_r - mu_r*mu_r > 0
         |      THEN m2_r - mu_r*mu_r ELSE 0 END) / 127.5 AS FLOAT) AS DOUBLE),
         |    CAST(CAST(sqrt(CASE WHEN m2_g - mu_g*mu_g > 0
         |      THEN m2_g - mu_g*mu_g ELSE 0 END) / 127.5 AS FLOAT) AS DOUBLE),
         |    CAST(CAST(sqrt(CASE WHEN m2_b - mu_b*mu_b > 0
         |      THEN m2_b - mu_b*mu_b ELSE 0 END) / 127.5 AS FLOAT) AS DOUBLE),
         |    CAST(CAST(CAST(w AS DOUBLE) / (w + h) AS FLOAT) AS DOUBLE),
         |    CAST(CAST(CAST(mx - mn AS DOUBLE) / 255.0 AS FLOAT) AS DOUBLE)
         |  ] AS e FROM mv
         |), np AS (
         |  SELECT CAST(greatest(4, least(30,
         |    ceil(log2((count(*) + 0.5) / $ndTargetLoad)))) AS INT) AS n
         |  FROM documents
         |), pl AS (
         |  SELECT pn, list_transform(generate_series(1, 8),
         |    d -> CAST(concat('0x', substr(md5(CAST(pn AS VARCHAR) || '_' ||
         |      CAST(d - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000) AS pv
         |  FROM (SELECT unnest(generate_series(0, (SELECT n FROM np) - 1)) AS pn)
         |), bk AS (
         |  SELECT vec_id, CAST(sum(CASE WHEN
         |      list_reduce(list_transform(generate_series(1,8),
         |        i -> e[i] * CAST(pv[i] AS DOUBLE)), (u,v) -> u + v) > 0
         |    THEN (CAST(1 AS BIGINT) << pn) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM emb CROSS JOIN pl GROUP BY vec_id
         |), nrm AS (
         |  SELECT vec_id, sqrt(list_reduce(list_transform(generate_series(1,8),
         |    i -> e[i] * e[i]), (u,v) -> u + v)) AS nm FROM emb
         |), nv AS (
         |  SELECT e2.vec_id, list_transform(generate_series(1,8),
         |    i -> e2.e[i] / r.nm) AS v
         |  FROM emb e2 JOIN nrm r USING (vec_id)
         |), eb AS (
         |  SELECT n2.vec_id, n2.v, bk.bucket FROM nv n2 JOIN bk USING (vec_id)
         |), gd AS (
         |  SELECT * FROM eb
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= $simMaxBucket
         |)
         |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |  list_reduce(list_transform(generate_series(1,8),
         |    i -> x.v[i] * y.v[i]), (u,v) -> u + v) AS cos
         |FROM gd x JOIN gd y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE list_reduce(list_transform(generate_series(1,8),
         |    i -> x.v[i] * y.v[i]), (u,v) -> u + v) >= 0.995""".stripMargin,

    "m_image_dims" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |       ELSE 'gif' END AS fmt,
        |  CAST(doc_id % 1000 + 1 AS INT) AS width,
        |  CAST(doc_id % 700 + 1 AS INT) AS height
        |FROM documents""".stripMargin,

    // the engine parsed real BMP/PPM/TIFF/ICO header bytes back out of
    // the payloads; the oracle replays the synthesis arithmetic
    "m_dims_extra" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
        |       WHEN 2 THEN 'tiff' ELSE 'ico' END AS fmt,
        |  CAST(CASE CAST(doc_id % 4 AS INT)
        |    WHEN 1 THEN doc_id % 13 + 1
        |    WHEN 3 THEN doc_id % 255 + 1
        |    ELSE doc_id % 1000 + 1 END AS INT) AS width,
        |  CAST(CASE CAST(doc_id % 4 AS INT)
        |    WHEN 1 THEN doc_id % 7 + 1
        |    WHEN 3 THEN doc_id % 100 + 1
        |    ELSE doc_id % 700 + 1 END AS INT) AS height
        |FROM documents""".stripMargin,

    // the engine decoded REAL pixel bytes; the oracle replays the stats
    // from the solid-color synthesis arithmetic (exact longs throughout)
    // jpeg arm: flat gray g = 192 + doc_id%64 (even docs, positive DC
    // diff) or 64 - doc_id%64 (odd, negative) — exact because the
    // synthesized stream is DC-only with Q=8, where any conforming IDCT
    // reconstructs round(dc*8/8)+128 bit-exactly
    "m_pixel_stats" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
        |       WHEN 2 THEN 'png' WHEN 3 THEN 'gif' ELSE 'jpeg' END AS fmt,
        |  CAST(CASE WHEN doc_id % 5 = 4 THEN (doc_id % 4 + 1) * 8
        |       ELSE doc_id % 13 + 1 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 5 = 4 THEN (doc_id % 3 + 1) * 8
        |       ELSE doc_id % 7 + 1 END AS INT) AS height,
        |  CASE WHEN doc_id % 5 = 4 THEN 64 * (doc_id % 4 + 1) * (doc_id % 3 + 1) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END)
        |       ELSE (doc_id % 13 + 1) * (doc_id % 7 + 1) * ((doc_id * 13) % 256)
        |       END AS sum_r,
        |  CASE WHEN doc_id % 5 = 4 THEN 64 * (doc_id % 4 + 1) * (doc_id % 3 + 1) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END)
        |       ELSE (doc_id % 13 + 1) * (doc_id % 7 + 1) * ((doc_id * 7) % 256)
        |       END AS sum_g,
        |  CASE WHEN doc_id % 5 = 4 THEN 64 * (doc_id % 4 + 1) * (doc_id % 3 + 1) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END)
        |       ELSE (doc_id % 13 + 1) * (doc_id % 7 + 1) * (doc_id % 256)
        |       END AS sum_b,
        |  CASE WHEN doc_id % 5 = 4 THEN 64 * (doc_id % 4 + 1) * (doc_id % 3 + 1)
        |       ELSE (doc_id % 13 + 1) * (doc_id % 7 + 1) END AS n_px,
        |  CAST(CASE WHEN doc_id % 5 = 4 THEN
        |         CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |              ELSE 64 - doc_id % 64 END
        |       ELSE least((doc_id * 13) % 256, (doc_id * 7) % 256,
        |                   doc_id % 256) END AS INT) AS min_ch,
        |  CAST(CASE WHEN doc_id % 5 = 4 THEN
        |         CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |              ELSE 64 - doc_id % 64 END
        |       ELSE greatest((doc_id * 13) % 256, (doc_id * 7) % 256,
        |                      doc_id % 256) END AS INT) AS max_ch,
        |  CASE WHEN doc_id % 5 = 4 THEN 64 * (doc_id % 4 + 1) * (doc_id % 3 + 1) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END)
        |       ELSE (doc_id % 13 + 1) * (doc_id % 7 + 1) *
        |         ((doc_id * 13) % 256) * ((doc_id * 13) % 256)
        |       END AS sq_r,
        |  CASE WHEN doc_id % 5 = 4 THEN 64 * (doc_id % 4 + 1) * (doc_id % 3 + 1) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END)
        |       ELSE (doc_id % 13 + 1) * (doc_id % 7 + 1) *
        |         ((doc_id * 7) % 256) * ((doc_id * 7) % 256)
        |       END AS sq_g,
        |  CASE WHEN doc_id % 5 = 4 THEN 64 * (doc_id % 4 + 1) * (doc_id % 3 + 1) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END) *
        |         (CASE WHEN doc_id % 2 = 0 THEN 192 + doc_id % 64
        |               ELSE 64 - doc_id % 64 END)
        |       ELSE (doc_id % 13 + 1) * (doc_id % 7 + 1) *
        |         (doc_id % 256) * (doc_id % 256)
        |       END AS sq_b
        |FROM documents""".stripMargin,

    "m_container_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'tiff' WHEN 1 THEN 'ico'
        |       WHEN 2 THEN 'id3' ELSE 'ogg' END AS kind,
        |  CASE WHEN doc_id % 5 = 0 THEN CAST(doc_id % 500 + 1 AS INT)
        |       WHEN doc_id % 5 = 1 THEN CAST(CASE WHEN doc_id % 256 = 0
        |         THEN 256 ELSE doc_id % 256 END AS INT) END AS width,
        |  CASE WHEN doc_id % 5 = 0 THEN CAST(doc_id % 300 + 1 AS INT)
        |       WHEN doc_id % 5 = 1 THEN CAST(CASE WHEN (doc_id * 3) % 256 = 0
        |         THEN 256 ELSE (doc_id * 3) % 256 END AS INT) END AS height,
        |  CASE WHEN doc_id % 5 = 2 THEN '2.' ||
        |    CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS VARCHAR)
        |    END AS id3_version,
        |  CASE WHEN doc_id % 5 = 2
        |    THEN 't' || CAST(doc_id AS VARCHAR) END AS title,
        |  CASE WHEN doc_id % 5 = 2
        |    THEN 'a' || CAST(doc_id AS VARCHAR) END AS artist,
        |  CASE WHEN doc_id % 5 = 2
        |    THEN 'v1t' || CAST(doc_id AS VARCHAR) END AS v1_title,
        |  CASE WHEN doc_id % 5 = 3 THEN 'opus'
        |       WHEN doc_id % 5 = 4 THEN 'vorbis' END AS codec,
        |  CASE WHEN doc_id % 5 IN (3, 4)
        |    THEN CAST(doc_id % 8 + 1 AS INT) END AS channels,
        |  CASE WHEN doc_id % 5 IN (3, 4) THEN CAST(
        |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |         WHEN 2 THEN 44100 ELSE 48000 END AS INT) END AS sample_rate,
        |  CASE WHEN doc_id % 5 IN (3, 4)
        |    THEN (doc_id % 1000 + 1) * 10 END AS duration_ms
        |FROM documents""".stripMargin,

    "z_dump_nested" ->
      """SELECT to_json(struct_pack(doc_id := doc_id,
        |  meta := struct_pack(lang := lang, n_chars := n_chars))) AS json
        |FROM documents""".stripMargin,

    "z_dump_idx" ->
      """SELECT to_json(struct_pack(doc_id := doc_id,
        |  items := [struct_pack(i := doc_id, s := 'a'),
        |            struct_pack(i := doc_id + 2, s := 'c')])) AS json,
        |  to_json(struct_pack(doc_id := doc_id,
        |  items := [struct_pack(i := doc_id),
        |            struct_pack(i := doc_id + 2)])) AS json_sub
        |FROM documents""".stripMargin,

    "q_tagged_union" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'purchase' AND value < 10 THEN 1
        |       WHEN event_type = 'click'
        |            AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 1
        |       ELSE 0 END AS n_viol,
        |  CASE WHEN event_type = 'purchase' AND value < 10 THEN 'greater_than_equal'
        |       WHEN event_type = 'click'
        |            AND CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 THEN 'less_than_equal'
        |       END AS vtype
        |FROM events""".stripMargin,

    "x_luhn" ->
      """WITH c AS (SELECT doc_id, '4' || lpad(CAST(doc_id AS VARCHAR), 15, '0') AS card
        |           FROM documents)
        |SELECT doc_id,
        |  regexp_matches(card, '^[0-9]{12,19}$') AND
        |  list_reduce(list_transform(generate_series(1, length(card)), i ->
        |    CASE WHEN i % 2 = 0
        |         THEN CASE WHEN CAST(substr(reverse(card), i, 1) AS INT) * 2 > 9
        |                   THEN CAST(substr(reverse(card), i, 1) AS INT) * 2 - 9
        |                   ELSE CAST(substr(reverse(card), i, 1) AS INT) * 2 END
        |         ELSE CAST(substr(reverse(card), i, 1) AS INT) END),
        |    (a, b) -> a + b) % 10 = 0 AS luhn_ok,
        |  CASE WHEN substr(card, 1, 1) = '4' THEN 'visa'
        |       WHEN substr(card, 1, 2) BETWEEN '51' AND '55' THEN 'mastercard'
        |       WHEN substr(card, 1, 2) IN ('34', '37') THEN 'amex'
        |       ELSE 'other' END AS brand
        |FROM c""".stripMargin,

    // The fixture expectations are the REFERENCE TEST TABLE itself
    // (emailFixtures carries test_networks.py's expected name/email);
    // the oracle replays them as index-keyed CASE lookups, so the driver
    // compare pins the engine's grammar to pydantic's fixture-for-fixture.
    // pins the engine's CPython-ipaddress transcription fixture-for-fixture
    // (the goldens were generated with the reference's own delegate, the
    // stdlib ipaddress module); CASE lookups keyed on the fixture index
    "x_ip" -> {
      val n = ipFixtures.size
      def q(s: String): String =
        if (s == null) "NULL"
        else "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
      def cases(f: ((String, String, String, String)) => String): String =
        ipFixtures.zipWithIndex
          .map { case (t, i) => s"WHEN $i THEN ${f(t)}" }.mkString(" ")
      s"""SELECT doc_id,
         |  CASE CAST(doc_id % $n AS INT) ${cases(t => q(t._2))} END AS ip_addr,
         |  CASE CAST(doc_id % $n AS INT) ${cases(t => q(t._3))} END AS ip_iface,
         |  CASE CAST(doc_id % $n AS INT) ${cases(t => q(t._4))} END AS ip_net,
         |  CASE CAST(doc_id % $n AS INT)
         |    ${cases(t => if (t._2 == null) "'ip_any_address'" else "NULL")}
         |  END AS err_addr,
         |  CASE CAST(doc_id % $n AS INT)
         |    ${cases(t => if (t._3 == null) "'ip_any_interface'" else "NULL")}
         |  END AS err_iface,
         |  CASE CAST(doc_id % $n AS INT)
         |    ${cases(t => if (t._4 == null) "'ip_any_network'" else "NULL")}
         |  END AS err_net
         |FROM documents""".stripMargin
    },

    "x_email" -> {
      val n = emailFixtures.size
      def q(s: String): String =
        if (s == null) "NULL"
        else "'" + s.replace("'", "''") + "'"
      def cases(f: ((String, String, String)) => String): String =
        emailFixtures.zipWithIndex
          .map { case (t, i) => s"WHEN $i THEN ${f(t)}" }.mkString(" ")
      s"""SELECT doc_id,
         |  CASE WHEN doc_id % 10 = 0 THEN FALSE ELSE TRUE END AS email_ok,
         |  CASE CAST(doc_id % $n AS INT)
         |    ${cases(t => if (t._2 == null) "FALSE" else "TRUE")} END AS fix_ok,
         |  CASE CAST(doc_id % $n AS INT) ${cases(t => q(t._2))}
         |    ELSE NULL END AS fix_name,
         |  CASE CAST(doc_id % $n AS INT) ${cases(t => q(t._3))}
         |    ELSE NULL END AS fix_email
         |FROM documents""".stripMargin
    },

    // Replays the generator + pydantic canonicalization: parse the synthetic
    // color back to channel bytes, then as_hex (short when every byte
    // repeats its nibble, i.e. byte % 17 == 0) and as_rgb/rgba.
    "x_color" ->
      """WITH b0 AS (SELECT doc_id, CAST(doc_id % 6 AS INT) m,
        |  md5(CAST(doc_id AS VARCHAR)) h,
        |  CAST(doc_id % 256 AS INT) cr, CAST((doc_id*7) % 256 AS INT) cg,
        |  CAST((doc_id*13) % 256 AS INT) cb FROM documents),
        |par AS (SELECT doc_id, m,
        |  CASE m WHEN 0 THEN CAST(concat('0x', substr(h,1,2)) AS BIGINT)
        |         WHEN 1 THEN CAST(concat('0x', substr(h,1,1), substr(h,1,1)) AS BIGINT)
        |         WHEN 2 THEN cr WHEN 4 THEN cr
        |         WHEN 3 THEN CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 0 WHEN 1 THEN 255 WHEN 2 THEN 240 ELSE 255 END END r,
        |  CASE m WHEN 0 THEN CAST(concat('0x', substr(h,3,2)) AS BIGINT)
        |         WHEN 1 THEN CAST(concat('0x', substr(h,2,1), substr(h,2,1)) AS BIGINT)
        |         WHEN 2 THEN cg WHEN 4 THEN cg
        |         WHEN 3 THEN CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 248 ELSE 215 END END g,
        |  CASE m WHEN 0 THEN CAST(concat('0x', substr(h,5,2)) AS BIGINT)
        |         WHEN 1 THEN CAST(concat('0x', substr(h,3,1), substr(h,3,1)) AS BIGINT)
        |         WHEN 2 THEN cb WHEN 4 THEN cb
        |         WHEN 3 THEN CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 128 WHEN 1 THEN 0 WHEN 2 THEN 255 ELSE 0 END END b,
        |  CASE WHEN m = 4 THEN CAST(round(0.25 * 255) AS BIGINT) END ab
        |  FROM b0)
        |SELECT doc_id, m <> 5 AS is_color,
        |  CASE WHEN m = 5 THEN NULL
        |       WHEN r%17=0 AND g%17=0 AND b%17=0 AND (ab IS NULL OR ab%17=0)
        |       THEN '#' || substr(printf('%02x',r),1,1) || substr(printf('%02x',g),1,1)
        |            || substr(printf('%02x',b),1,1)
        |            || CASE WHEN ab IS NULL THEN '' ELSE substr(printf('%02x',ab),1,1) END
        |       ELSE '#' || printf('%02x',r) || printf('%02x',g) || printf('%02x',b)
        |            || CASE WHEN ab IS NULL THEN '' ELSE printf('%02x',ab) END END AS hex,
        |  CASE WHEN m = 5 THEN NULL
        |       WHEN ab IS NULL THEN printf('rgb(%d, %d, %d)', r, g, b)
        |       ELSE printf('rgba(%d, %d, %d, 0.25)', r, g, b) END AS rgb
        |FROM par""".stripMargin,

    "x_bytesize" ->
      """SELECT doc_id,
        |  CAST(CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN n_chars
        |    WHEN 1 THEN n_chars * 1024
        |    WHEN 2 THEN n_chars * 1000000
        |    ELSE n_chars * 1073741824 END AS BIGINT) AS bytes
        |FROM documents""".stripMargin,

    "s_ann_multi" ->
      s"""WITH np AS (SELECT CAST(greatest(4, least(30,
         |    ceil(log2((count(*) + 0.5) / $annTargetLoad)))) AS INT) AS n FROM embeddings),
         |pl AS (SELECT p, list_transform(generate_series(1, 64),
         |    d -> CAST(concat('0x', substr(md5(CAST(p AS VARCHAR) || '_' || CAST(d - 1 AS VARCHAR)), 1, 15)) AS BIGINT) % 2001 - 1000) AS pv
         |  FROM (SELECT unnest(generate_series(0, 3 * (SELECT n FROM np) - 1)) AS p)),
         |bkm AS (SELECT vec_id, CAST(p // (SELECT n FROM np) AS INT) AS tt,
         |    CAST(sum(CASE WHEN
         |      list_reduce(list_transform(generate_series(1,64), i -> CAST(embedding[i] AS DOUBLE) * CAST(pv[i] AS DOUBLE)), (u,w) -> u + w) > 0
         |    THEN (CAST(1 AS BIGINT) << (p % (SELECT n FROM np))) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM embeddings CROSS JOIN pl GROUP BY vec_id, tt),
         |$normCteSql,
         |ebm AS (SELECT b.vec_id, b.tt, b.bucket, n.v FROM bkm b JOIN nv n USING (vec_id)),
         |gdm AS (SELECT * FROM ebm QUALIFY count(*) OVER (PARTITION BY tt, bucket) <= $simMaxBucket),
         |cd AS (SELECT DISTINCT x.vec_id query_id, y.vec_id neighbor_id
         |       FROM ebm x JOIN gdm y ON x.tt = y.tt AND x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |sc AS (SELECT query_id, neighbor_id, ${ndotSql("xq.v", "yq.v")} AS cos
         |       FROM cd JOIN nv xq ON xq.vec_id = query_id JOIN nv yq ON yq.vec_id = neighbor_id)
         |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cos
         |FROM (SELECT query_id, neighbor_id, cos,
         |        row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) rank
         |      FROM sc)
         |WHERE rank <= 3""".stripMargin,

    "s_near_dup" ->
      s"""WITH ${autoBucketCteSql(ndTargetLoad)},
         |$normCteSql,
         |eb AS (SELECT n.vec_id, n.v, bk.bucket FROM nv n JOIN bk USING (vec_id)),
         |gd AS (SELECT * FROM eb QUALIFY count(*) OVER (PARTITION BY bucket) <= $simMaxBucket)
         |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |  ${ndotSql("x.v", "y.v")} AS cos
         |FROM gd x JOIN gd y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE ${ndotSql("x.v", "y.v")} >= 0.4""".stripMargin,


    "v_verdict" ->
      """SELECT doc_id,
        |  coalesce(doc_id >= 0 AND length(text) >= 100 AND length(text) <= 500
        |    AND lang IN ('en','de','fr') AND regexp_matches(source, '^src[0-9]+$')
        |    AND n_chars >= 1 AND n_chars <= 1000, FALSE)
        |  AND doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL
        |  AND source IS NOT NULL AND n_chars IS NOT NULL AS valid
        |FROM documents""".stripMargin,

    "v_violations" -> docViolationsSql("documents"),

    // cross-field validators: field rows replayed closed-form (n_loc=1,
    // no ctx.error), model rows ONLY for field-clean docs failing a
    // check (n_loc=0, value_error, ctx.error) — the gating is part of
    // the compare
    "v_cross" ->
      s"""WITH fv AS (${docViolationsSql("documents")}),
         |clean AS (SELECT * FROM documents WHERE
         |  doc_id IS NOT NULL AND doc_id >= 0 AND
         |  text IS NOT NULL AND length(text) BETWEEN 100 AND 500 AND
         |  lang IN ('en','de','fr') AND
         |  source IS NOT NULL AND regexp_matches(source, '^src[0-9]+$$') AND
         |  n_chars IS NOT NULL AND n_chars BETWEEN 1 AND 1000)
         |SELECT doc_id, CAST(1 AS BIGINT) AS n_loc, vtype,
         |  CAST(NULL AS VARCHAR) AS err FROM fv
         |UNION ALL
         |SELECT doc_id, 0, 'value_error', 'n_chars must equal len(text)'
         |FROM clean WHERE n_chars != length(text)
         |UNION ALL
         |SELECT doc_id, 0, 'value_error', 'n_chars must be even'
         |FROM clean WHERE n_chars % 2 != 0
         |UNION ALL
         |SELECT doc_id, 0, 'value_error', 'english docs need >= 250 chars'
         |FROM clean WHERE NOT (lang != 'en' OR n_chars >= 250)""".stripMargin,

    // replay of the regression diff: the doc-model violation SQL templated
    // over both snapshots, then a null-safe FULL JOIN classifies each key
    "v_diff" ->
      s"""WITH prev_docs AS (
         |  SELECT doc_id, text,
         |    CASE WHEN doc_id % 5 = 0 THEN NULL ELSE lang END AS lang,
         |    source, n_chars
         |  FROM documents WHERE doc_id % 7 != 0),
         |cur AS (SELECT DISTINCT doc_id, field, vtype, TRUE AS in_cur
         |  FROM (${docViolationsSql("documents")}) t),
         |prev AS (SELECT DISTINCT doc_id, field, vtype, TRUE AS in_prev
         |  FROM (${docViolationsSql("prev_docs")}) t)
         |SELECT coalesce(c.doc_id, p.doc_id) AS doc_id,
         |  coalesce(c.field, p.field) AS field,
         |  coalesce(c.vtype, p.vtype) AS vtype,
         |  CASE WHEN c.in_cur AND p.in_prev THEN 'persisting'
         |       WHEN c.in_cur THEN 'new' ELSE 'fixed' END AS status
         |FROM cur c FULL JOIN prev p
         |  ON c.doc_id IS NOT DISTINCT FROM p.doc_id
         |  AND c.field IS NOT DISTINCT FROM p.field
         |  AND c.vtype IS NOT DISTINCT FROM p.vtype""".stripMargin,

    "v_col_stats" ->
      """SELECT 'lang' AS col_name, count(*) AS row_count, count(lang) AS nonnull_count,
        |  count(DISTINCT lang) AS distinct_ct, CAST(min(lang) AS VARCHAR) AS min_value,
        |  CAST(max(lang) AS VARCHAR) AS max_value FROM documents
        |UNION ALL
        |SELECT 'source', count(*), count(source), count(DISTINCT source),
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*), count(n_chars), count(DISTINCT n_chars),
        |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents""".stripMargin,

    "v_unique_dups" ->
      """SELECT lang, source, count(*) AS dup_count FROM documents
        |GROUP BY lang, source HAVING count(*) > 1""".stripMargin,

    "v_unique_salted" ->
      """SELECT lang, source, count(*) AS dup_count FROM documents
        |GROUP BY lang, source HAVING count(*) > 1""".stripMargin,

    "v_ri_lang" ->
      """SELECT doc_id, lang FROM documents
        |WHERE lang IS NOT NULL AND lang NOT IN ('en','de','fr','es')""".stripMargin,

    "v_drift_psi" ->
      """WITH hist AS (
        |  SELECT source AS part,
        |         least(greatest(CAST(floor(n_chars / 30.0) AS INT), 0), 19) AS bucket,
        |         count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |ptot AS (SELECT part, sum(cnt) AS part_total FROM hist GROUP BY 1),
        |ref AS (SELECT bucket, sum(cnt) AS ref_cnt FROM hist GROUP BY 1),
        |refp AS (SELECT bucket, ref_cnt * 1.0 / (SELECT sum(ref_cnt) FROM ref) AS q FROM ref),
        |grid AS (SELECT p.part, p.part_total, r.bucket, r.q FROM ptot p CROSS JOIN refp r),
        |j AS (SELECT g.part, coalesce(h.cnt, 0) * 1.0 / g.part_total AS p, g.q
        |      FROM grid g LEFT JOIN hist h ON h.part = g.part AND h.bucket = g.bucket)
        |SELECT part, round(sum((greatest(p, 0.0001) - greatest(q, 0.0001))
        |  * ln(greatest(p, 0.0001) / greatest(q, 0.0001))), 4) AS psi
        |FROM j GROUP BY part""".stripMargin,

    "v_drift_ks" ->
      """WITH hist AS (
        |  SELECT source AS part,
        |         least(greatest(CAST(floor(n_chars / 30.0) AS INT), 0), 19) AS bucket,
        |         count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |ptot AS (SELECT part, sum(cnt) AS part_total FROM hist GROUP BY 1),
        |ref AS (SELECT bucket, sum(cnt) AS ref_cnt FROM hist GROUP BY 1),
        |refcdf AS (SELECT bucket,
        |    sum(ref_cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |      * 1.0 / (SELECT sum(ref_cnt) FROM ref) AS ref_cdf FROM ref),
        |grid AS (SELECT p.part, p.part_total, r.bucket, r.ref_cdf FROM ptot p CROSS JOIN refcdf r),
        |j AS (SELECT g.part, g.bucket, g.ref_cdf,
        |        sum(coalesce(h.cnt, 0)) OVER (PARTITION BY g.part ORDER BY g.bucket ROWS UNBOUNDED PRECEDING)
        |          * 1.0 / g.part_total AS part_cdf
        |      FROM grid g LEFT JOIN hist h ON h.part = g.part AND h.bucket = g.bucket)
        |SELECT part, round(max(abs(part_cdf - ref_cdf)), 4) AS ks
        |FROM j GROUP BY part""".stripMargin,

    "v_drift_w1" ->
      """WITH hist AS (
        |  SELECT source AS part,
        |         least(greatest(CAST(floor(n_chars / 30.0) AS INT), 0), 19) AS bucket,
        |         count(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |ptot AS (SELECT part, sum(cnt) AS part_total FROM hist GROUP BY 1),
        |ref AS (SELECT bucket, sum(cnt) AS ref_cnt FROM hist GROUP BY 1),
        |refp AS (SELECT bucket,
        |    ref_cnt * 1.0 / (SELECT sum(ref_cnt) FROM ref) AS q,
        |    sum(ref_cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |      * 1.0 / (SELECT sum(ref_cnt) FROM ref) AS ref_cdf FROM ref),
        |grid AS (SELECT p.part, p.part_total, r.bucket, r.q, r.ref_cdf
        |         FROM ptot p CROSS JOIN refp r),
        |j AS (SELECT g.part, g.q, g.ref_cdf,
        |        coalesce(h.cnt, 0) * 1.0 / g.part_total AS p,
        |        sum(coalesce(h.cnt, 0)) OVER (PARTITION BY g.part ORDER BY g.bucket ROWS UNBOUNDED PRECEDING)
        |          * 1.0 / g.part_total AS part_cdf
        |      FROM grid g LEFT JOIN hist h ON h.part = g.part AND h.bucket = g.bucket)
        |SELECT part,
        |  round(sum(abs(part_cdf - ref_cdf)) * 30.0, 4) AS w1,
        |  round(sum(
        |    CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) / 2 ELSE 0 END +
        |    CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) / 2 ELSE 0 END), 6) AS jsd
        |FROM j GROUP BY part""".stripMargin,

    // replays SpecInfer's decision table per events column: kind by dtype
    // (string->enum iff 1 <= distinct <= 16), observed bounds, first
    // all-match pattern (bool_and over non-nulls == the engine's
    // matched-count == non-null-count rule)
    "i_infer" -> {
      val pats = SpecInfer.patterns.map { case (nm, re) =>
        s"WHEN bool_and(regexp_matches(%COL%, '$re')) THEN '$nm'"
      }.mkString(" ")
      def strArm(c: String) =
        s"""SELECT '$c' AS field,
           |  CASE WHEN count(DISTINCT $c) BETWEEN 1 AND 16 THEN 'enum' ELSE 'str' END AS kind,
           |  count(*) - count($c) > 0 AS nullable,
           |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
           |  CAST(min(length($c)) AS BIGINT) AS min_len,
           |  CAST(max(length($c)) AS BIGINT) AS max_len,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  CASE WHEN count(DISTINCT $c) BETWEEN 1 AND 16 THEN
           |    (SELECT string_agg(v, ',' ORDER BY v)
           |     FROM (SELECT DISTINCT $c AS v FROM events WHERE $c IS NOT NULL))
           |  END AS enum_vals,
           |  CASE WHEN count(DISTINCT $c) > 16 AND count($c) > 0 THEN
           |    CASE ${pats.replace("%COL%", c)} END
           |  END AS pattern
           |FROM events""".stripMargin
      def numArm(c: String, kind: String) =
        s"""SELECT '$c' AS field, '$kind' AS kind,
           |  count(*) - count($c) > 0 AS nullable,
           |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len,
           |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS enum_vals, CAST(NULL AS VARCHAR) AS pattern
           |FROM events""".stripMargin
      def plainArm(c: String, kind: String) =
        s"""SELECT '$c' AS field, '$kind' AS kind,
           |  count(*) - count($c) > 0 AS nullable,
           |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS enum_vals, CAST(NULL AS VARCHAR) AS pattern
           |FROM events""".stripMargin
      Seq(numArm("event_id", "int"), plainArm("ts", "datetime"),
        numArm("user_id", "int"), strArm("event_type"),
        numArm("value", "float"), strArm("props"))
        .mkString("\nUNION ALL\n")
    },

    // independent replay of the snapshot spec diff: both profiles rebuilt
    // with the i_infer arm logic (parameterized by expression), then the
    // same fixed-order flag/reason algebra over a full-outer join
    "i_diff" -> {
      val pats = SpecInfer.patterns.map { case (nm, re) =>
        s"WHEN bool_and(regexp_matches(%COL%, '$re')) THEN '$nm'"
      }.mkString(" ")
      def strArm(field: String, expr: String) =
        s"""SELECT '$field' AS field,
           |  CASE WHEN count(DISTINCT $expr) BETWEEN 1 AND 16 THEN 'enum'
           |    ELSE 'str' END AS kind,
           |  count(*) - count($expr) > 0 AS nullable,
           |  CAST(min(length($expr)) AS BIGINT) AS min_len,
           |  CAST(max(length($expr)) AS BIGINT) AS max_len,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  CASE WHEN count(DISTINCT $expr) BETWEEN 1 AND 16 THEN
           |    (SELECT string_agg(v, ',' ORDER BY v) FROM
           |      (SELECT DISTINCT $expr AS v FROM documents
           |       WHERE $expr IS NOT NULL))
           |  END AS enum_vals,
           |  CASE WHEN count(DISTINCT $expr) > 16 AND count($expr) > 0 THEN
           |    CASE ${pats.replace("%COL%", expr)} END
           |  END AS pattern
           |FROM documents""".stripMargin
      def numArm(field: String, expr: String, kind: String) =
        s"""SELECT '$field' AS field, '$kind' AS kind,
           |  count(*) - count($expr) > 0 AS nullable,
           |  CAST(NULL AS BIGINT) AS min_len, CAST(NULL AS BIGINT) AS max_len,
           |  CAST(min($expr) AS DOUBLE) AS min_num,
           |  CAST(max($expr) AS DOUBLE) AS max_num,
           |  CAST(NULL AS VARCHAR) AS enum_vals, CAST(NULL AS VARCHAR) AS pattern
           |FROM documents""".stripMargin
      val pa = Seq(numArm("doc_id", "doc_id", "int"), strArm("text", "text"),
        strArm("lang", "lang"), strArm("source", "source"),
        numArm("n_chars", "n_chars", "int")).mkString("\nUNION ALL\n")
      val pb = Seq(numArm("doc_id", "doc_id", "int"),
        strArm("text", "substr(text, 1, 120)"), strArm("lang", "lang"),
        numArm("n_chars", "CAST(n_chars AS DOUBLE)", "float"),
        numArm("n_tokens", "len(string_split(text, ' '))", "int"))
        .mkString("\nUNION ALL\n")
      s"""WITH pa AS ($pa),
         |pb AS ($pb),
         |f AS (SELECT a.field AS a_field, b.field AS b_field,
         |  a.kind AS kind_a, b.kind AS kind_b,
         |  coalesce(a.kind <> b.kind, FALSE) AS f_kind,
         |  coalesce(a.nullable AND NOT b.nullable, FALSE) AS f_nn,
         |  coalesce(NOT a.nullable AND b.nullable, FALSE) AS f_nw,
         |  coalesce(b.min_len > a.min_len, FALSE)
         |    OR coalesce(b.max_len < a.max_len, FALSE) AS f_ln,
         |  coalesce(b.min_len < a.min_len, FALSE)
         |    OR coalesce(b.max_len > a.max_len, FALSE) AS f_lw,
         |  coalesce(b.min_num > a.min_num, FALSE)
         |    OR coalesce(b.max_num < a.max_num, FALSE) AS f_mn,
         |  coalesce(b.min_num < a.min_num, FALSE)
         |    OR coalesce(b.max_num > a.max_num, FALSE) AS f_mw,
         |  coalesce(a.enum_vals IS NOT NULL AND b.enum_vals IS NOT NULL AND
         |    len(list_filter(string_split(a.enum_vals, ','),
         |      x -> NOT list_contains(string_split(b.enum_vals, ','), x)))
         |    > 0, FALSE) AS f_er,
         |  coalesce(a.enum_vals IS NOT NULL AND b.enum_vals IS NOT NULL AND
         |    len(list_filter(string_split(b.enum_vals, ','),
         |      x -> NOT list_contains(string_split(a.enum_vals, ','), x)))
         |    > 0, FALSE) AS f_ea,
         |  a.pattern IS DISTINCT FROM b.pattern AS f_pat
         |  FROM pa a FULL OUTER JOIN pb b ON a.field = b.field)
         |SELECT coalesce(a_field, b_field) AS field,
         |  CASE WHEN a_field IS NULL THEN 'added'
         |       WHEN b_field IS NULL THEN 'removed'
         |       WHEN f_kind OR f_nn OR f_nw OR f_ln OR f_lw OR f_mn OR f_mw
         |         OR f_er OR f_ea OR f_pat THEN 'changed'
         |       ELSE 'same' END AS status,
         |  kind_a, kind_b,
         |  CASE WHEN b_field IS NULL THEN 1 WHEN a_field IS NULL THEN 0
         |       ELSE CAST(f_kind OR f_nn OR f_ln OR f_mn OR f_er OR f_pat
         |         AS INT) END AS breaking,
         |  CASE WHEN a_field IS NOT NULL AND b_field IS NOT NULL AND
         |    (f_kind OR f_nn OR f_nw OR f_ln OR f_lw OR f_mn OR f_mw OR f_er
         |     OR f_ea OR f_pat) THEN
         |    concat_ws(',', CASE WHEN f_kind THEN 'kind' END,
         |      CASE WHEN f_nn THEN 'nullable_narrowed' END,
         |      CASE WHEN f_nw THEN 'nullable_widened' END,
         |      CASE WHEN f_ln THEN 'len_narrowed' END,
         |      CASE WHEN f_lw THEN 'len_widened' END,
         |      CASE WHEN f_mn THEN 'num_narrowed' END,
         |      CASE WHEN f_mw THEN 'num_widened' END,
         |      CASE WHEN f_er THEN 'enum_removed' END,
         |      CASE WHEN f_ea THEN 'enum_added' END,
         |      CASE WHEN f_pat THEN 'pattern' END)
         |  END AS reasons
         |FROM f""".stripMargin
    },

    "v_json_field" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,

    "v_json_partial" -> {
      val rows = jpLookup.map { case (p, on, ts) =>
        def f(o: Option[(Int, String)]) = o match {
          case Some((cut, tail)) => s"$cut, '$tail'"
          case None => "NULL, NULL"
        }
        s"($p, ${f(on)}, ${f(ts)})"
      }.mkString(", ")
      s"""WITH d AS (SELECT doc_id,
         |  concat('{"k": ', CAST(100 + doc_id % 900 AS VARCHAR),
         |         ', "tags": ["alpha", "beta"], "note": "text"}') j,
         |  CAST(doc_id % ${jpTemplate.length} AS INT) + 1 p FROM documents),
         |t AS (SELECT doc_id, substr(j, 1, p) c, p FROM d),
         |lk(p, cut_on, tail_on, cut_ts, tail_ts) AS (VALUES $rows)
         |SELECT doc_id,
         |  CASE WHEN cut_on IS NULL THEN NULL
         |       ELSE substr(c, 1, cut_on) || tail_on END AS jon,
         |  CASE WHEN cut_ts IS NULL THEN NULL
         |       ELSE substr(c, 1, cut_ts) || tail_ts END AS jts
         |FROM t JOIN lk USING (p)""".stripMargin
    },

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue_e4,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_window_top3" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "d_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS copies
        |FROM documents GROUP BY text""".stripMargin,

    "t_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |FROM documents""".stripMargin,

    "t_quality" ->
      """SELECT doc_id,
        |  round(length(text) * 1.0 / len(string_split(text, ' ')), 3) AS chars_per_token,
        |  round(len(list_filter(string_split(text, ' '),
        |    x -> x IN ('the','a','of','and','to'))) * 1.0
        |    / len(string_split(text, ' ')), 4) AS stopword_ratio
        |FROM documents""".stripMargin
  )
}
