package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextOps

/** Specs for the training-data-pipeline operators: text analysis, near-dup
 * detection (MinHash/SimHash/Jaccard), and embedding similarity search. */
class PipelineOpsSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------------ text

  test("bpe tokens: letter runs, digit runs, single punctuation") {
    val n = Seq("foo_bar2 baz!!").toDF("text")
      .select(TextOps.bpeTokenCount(col("text"))).as[Long].head()
    // foo _ bar 2 baz ! ! -> 7
    assert(n == 7)
  }

  test("langId picks the profile with highest stopword hit rate") {
    val df = Seq(
      (1L, "the cat sat of the mat and it is a thing"),
      (2L, "der hund und die katze ist ein tier mit fell"),
      (3L, "le chat est pour la maison et les jardins")
    ).toDF("id", "text")
    val got = df.select(col("id"),
      TextOps.langId(col("text"), TextOps.defaultProfiles).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "en" && got(2L) == "de" && got(3L) == "fr")
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = (t: String) => Seq(t).toDF("text")
      .select(TextOps.fingerprint(col("text"))).as[Long].head()
    assert(fp("a b c") == fp("a b c"))
    assert(fp("a b c") != fp("c b a")) // permutation changes the hash
    assert(fp("a b c") >= 0 && fp("a b c") < 1000000007L)
  }

  // ----------------------------------------------------------------- dedup

  test("shingles: distinct word 3-grams; short docs fall back to full text") {
    val sh = Seq("a b c d").toDF("text")
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("jaccard: exact set similarity") {
    val j = Seq(((1 to 8).map("s" + _), (5 to 12).map("s" + _)))
      .toDF("a", "b").select(Dedup.jaccard(col("a"), col("b")))
      .as[Double].head()
    assert(j == 4.0 / 12.0)
  }

  test("minhash-LSH finds near-dup pairs and skips dissimilar docs") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " other x"
    val different = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, different)).toDF("id", "text")
    val pairs = Dedup.minhashLshPairs(df, "id", "text",
      numHashes = 12, bands = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 > 0.8)
  }

  test("jaccardNgramPairs: exact prefix-filtered All-Pairs matches brute force") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " other x"
    val different = (100 to 160).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, different), (4L, base))
      .toDF("id", "text")
    val pairs = Dedup.jaccardNgramPairs(df, "id", "text", shingleN = 3)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    // brute force over the same shingle sets
    def sh(t: String): Set[String] = {
      val toks = t.split("\\s+")
      (1 to math.max(toks.length - 2, 1))
        .map(i => toks.slice(i - 1, i + 2).mkString(" ")).toSet
    }
    val texts = Map(1L -> base, 2L -> nearDup, 3L -> different, 4L -> base)
    val expect = (for {
      a <- texts.keys; b <- texts.keys if a < b
      sa = sh(texts(a)); sb = sh(texts(b))
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size if j >= 0.5
    } yield (a, b, j)).toSeq.sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == expect)
    assert(pairs.map(p => (p._1, p._2)).toSet ==
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(pairs.find(p => (p._1, p._2) == (1L, 4L)).get._3 == 1.0)
  }

  test("decontaminate: n-gram collision fractions against a benchmark set") {
    import graft.text.TextOps
    val benchText = (1 to 20).map(i => s"ev$i").mkString(" ")
    val docs = Seq(
      (1L, benchText),                                   // exact copy -> 1.0
      (2L, (1 to 10).map(i => s"ev$i").mkString(" ")),   // prefix -> all hit
      (3L, (100 to 120).map(i => s"w$i").mkString(" "))) // disjoint -> 0.0
      .toDF("doc_id", "text")
    val bench = Seq(Tuple1(benchText)).toDF("text")
    val out = TextOps.decontaminate(docs, "doc_id", "text", bench, "text",
      n = 3).collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((18L, 18L, 1.0)))
    assert(out(2L) == ((8L, 8L, 1.0)))
    assert(out(3L)._2 == 0L && out(3L)._3 == 0.0)
  }

  test("stratifiedSample: hash-gated, deterministic, rate-accurate") {
    import graft.text.TextOps
    val df = (0L until 2000L).map(i =>
      (i, if (i % 2 == 0) "en" else "de")).toDF("doc_id", "lang")
    val kept = TextOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> ((1L, 4L))))
    val byLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 1000L)                 // unlisted stratum: all
    assert(math.abs(byLang("en") - 250L) < 60L)   // ~1/4 of 1000
    // deterministic: identical ids survive on a re-run
    val again = TextOps.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> ((1L, 4L))))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("jaccardNgramPairs maxDf: stop-shingle cap drops boilerplate " +
    "clusters; organic pairs survive") {
    // 6 boilerplate docs sharing a template (every template shingle has
    // df=6 > cap) + one organic near-dup pair with df<=2 shingles
    val tmpl = (1 to 40).map(i => s"tp$i").mkString(" ")
    val boiler = (1 to 6).map(k => (k.toLong, s"$tmpl uniq${k}a uniq${k}b"))
    val orgA = (1 to 30).map(i => s"og$i").mkString(" ")
    val orgB = (1 to 28).map(i => s"og$i").mkString(" ") + " zz yy"
    val df = (boiler ++ Seq((10L, orgA), (11L, orgB))).toDF("id", "text")
    val unguarded = Dedup.jaccardNgramPairs(df, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // boilerplate cluster is quadratic truth: all 15 pairs + the organic
    assert(unguarded.size == 16 && unguarded.contains((10L, 11L)))
    val guarded = Dedup.jaccardNgramPairs(df, "id", "text",
      maxDf = Some(5L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(guarded == Set((10L, 11L)))
  }

  test("jaccardNgramPairs maxSetSize: oversized docs are excluded from " +
    "the index entirely; pairs among bounded docs are untouched") {
    val orgA = (1 to 30).map(i => s"og$i").mkString(" ")
    val orgB = (1 to 28).map(i => s"og$i").mkString(" ") + " zz yy"
    // two monster docs that are near-dups of each other AND share a long
    // run with orgA — with the cap set, neither may pair with anything
    val huge1 = ((1 to 30).map(i => s"og$i") ++
      (1 to 400).map(i => s"big$i")).mkString(" ")
    val huge2 = ((1 to 30).map(i => s"og$i") ++
      (1 to 398).map(i => s"big$i")).mkString(" ") + " qq ww"
    val df = Seq((1L, orgA), (2L, orgB), (3L, huge1), (4L, huge2))
      .toDF("id", "text")
    val unguarded = Dedup.jaccardNgramPairs(df, "id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(unguarded.contains((1L, 2L)) && unguarded.contains((3L, 4L)))
    val guarded = Dedup.jaccardNgramPairs(df, "id", "text",
      maxSetSize = Some(100L))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(guarded == Set((1L, 2L)))
  }

  test("simhash: identical docs hash equal; near-dups are hamming-close") {
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val near = (1 to 79).map(i => s"tok$i").mkString(" ") + " tok80x"
    val far = (1 to 80).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("id", "text")
      .select(col("id"), Dedup.simhash(col("text")).as("sig"))
    val sigs = df.as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) < 10)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(4L)) > 15)
  }

  test("simhashPairs banding finds all pairs within maxHamming (exactness)") {
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, "completely different words"))
      .toDF("id", "text")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxHamming = 3, chunks = 4)
      .as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 == 0)
  }

  test("corpus clean: exact dup, near-dup, wrong-lang and low-quality all drop") {
    val en = (1 to 20).map(i => s"tok$i").mkString("the a of and to ", " ", "")
    val enNear = (1 to 18).map(i => s"tok$i").mkString("the a of and to ", " ", " x y")
    val de = "der die das und ist ein zu mit von nicht " +
      (1 to 15).map(i => s"w$i").mkString(" ")
    val short = "the a of"
    val df = Seq(
      (1L, en), (2L, en) /* exact dup */, (3L, enNear) /* near dup of 1 */,
      (4L, de) /* german */, (5L, short) /* too few tokens */,
      (6L, "the a of and to " + (100 to 120).map(i => s"z$i").mkString(" "))
    ).toDF("id", "text")
    val out = graft.text.CorpusClean.clean(df, "id", "text",
      TextOps.defaultProfiles, keepLangs = Seq("en"), minTokens = 10,
      maxCharsPerToken = 8.0)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 6L),
      s"expected Set(1, 6), got $out")
    // useComponents: transitive keep-min-per-group gives the same result
    // on this fixture (one near-dup component) — the policies only differ
    // on chains where a pair edge is missing
    val outCc = graft.text.CorpusClean.clean(df, "id", "text",
      TextOps.defaultProfiles, keepLangs = Seq("en"), minTokens = 10,
      maxCharsPerToken = 8.0, useComponents = true)
      .select("id").as[Long].collect().toSet
    assert(outCc == Set(1L, 6L), s"components policy: got $outCc")
  }

  test("exact dedup groups by content hash") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "text")
    val g = Dedup.exactGroups(df, "id", "text")
      .select("keep_id", "copies").as[(Long, Long)].collect().toSet
    assert(g == Set((1L, 2L), (3L, 1L)))
  }

  // ------------------------------------------------------------ similarity

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("cosine: known values") {
    val df = vecDf(Seq((1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)),
      (3L, Seq(2f, 0f, 0f))))
    val c = df.as("a").crossJoin(df.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding"), 3).as("c"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(math.abs(c((1L, 2L))) < 1e-12)      // orthogonal
    assert(math.abs(c((1L, 3L)) - 1.0) < 1e-12) // parallel
  }

  test("brute-force top-k is exact and deterministically ordered") {
    val df = vecDf(Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0f, 1f)),
      (4L, Seq(1f, 0.01f))))
    val top = Similarity.bruteForceTopK(df.filter(col("vec_id") === 1), df,
      "vec_id", "embedding", "vec_id", "embedding", k = 2, dim = 2)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(top == Set((1L, 4L), (2L, 2L))) // nearest = 4, then 2
  }

  test("LSH ANN: same-bucket neighbors scored exactly; near-dup pairs found") {
    val planes = Similarity.portablePlanes(4, 4)
    assert(planes == Similarity.portablePlanes(4, 4)) // deterministic
    val df = vecDf(Seq(
      (1L, Seq(1f, 0f, 0f, 0f)), (2L, Seq(0.99f, 0.01f, 0f, 0f)),
      (3L, Seq(-1f, 0f, 0f, 0f))))
    val nd = Similarity.nearDupPairs(df, "vec_id", "embedding", 0.9, planes)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd == Set((1L, 2L))) // 1~2 collide and are near-identical
    val ann = Similarity.annLsh(df, df, "vec_id", "embedding",
      "vec_id", "embedding", k = 1, planes = planes)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert(ann.get(1L).contains(2L))
  }
}
