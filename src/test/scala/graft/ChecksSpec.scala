package graft

import org.apache.spark.sql.functions._

import graft.checks.{Drift, TableChecks}
import graft.data.SourceFilesGen

class ChecksSpec extends SparkTestBase {

  lazy val sf = SourceFilesGen.generate(spark, 20000L).cache()

  test("generator: deterministic, skewed, violation-injecting") {
    def checksum() = SourceFilesGen.generate(spark, 1000L)
      .agg(sum(pmod(xxhash64(col("repo"), col("commit")), lit(1000000007L))))
      .collect().head.getLong(0)
    val a = checksum(); val b = checksum()
    assert(a == b) // same seed -> identical table
    val topShare = sf.groupBy("repo").count().orderBy(desc("count"))
      .limit(1).collect().head.getLong(1).toDouble / 20000
    assert(topShare > 0.15 && topShare < 0.25) // mega-repo ~20%
    val badCommit = sf.filter(!col("commit").rlike("^[0-9a-f]{40}$")).count()
    assert(badCommit > 0)
    val badLang = sf.filter(col("lang") === "klingon").count()
    assert(badLang > 0)
    val nullPath = sf.filter(col("path").isNull).count()
    assert(nullPath > 0)
  }

  test("column stats: null rate + distinct + quantiles in one pass") {
    val stats = TableChecks.columnStats(sf, Seq("repo", "path", "content"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(stats("path").getAs[Double]("null_rate") > 0.0)
    assert(stats("repo").getAs[Double]("null_rate") == 0.0)
    assert(stats("repo").getAs[Long]("approx_distinct") > 500)
    assert(stats("content").getAs[Int]("len_p95") > 0)
  }

  test("uniqueness: plain and salted agree") {
    val plain = TableChecks.duplicateKeys(sf, Seq("repo", "path", "commit"))
    val salted = TableChecks.duplicateKeysSalted(sf, Seq("repo", "path", "commit"))
    val p = plain.agg(count(lit(1)), sum("dup_count")).collect().head
    val s = salted.agg(count(lit(1)), sum("dup_count")).collect().head
    assert(p == s)
    assert(p.getLong(0) > 0) // generator injects duplicate triples
  }

  test("referential integrity: unknown lang rows surface") {
    val bad = TableChecks.referentialViolations(
      sf, "lang", SourceFilesGen.langDim(spark), "lang")
    assert(bad.count() > 0)
    assert(bad.filter(col("lang") =!= "klingon").count() == 0)
  }

  test("drift: the shifted repo is flagged, normal repos are not") {
    val big = sf.filter(col("repo").isin("org0/repo0", "org7/repo7", "org1/repo1",
      "org8/repo8", "org9/repo9"))
    val verdicts = Drift.driftVerdicts(big, col("repo"),
      length(col("content")), 0, 5000, nBuckets = 40)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(verdicts("org7/repo7")) // drifted: 4x content length
    assert(!verdicts("org0/repo0")) // mega-repo dominates ref -> not drifted
  }

  test("psi/ks: identical distribution scores ~zero") {
    val hist = Drift.histogram(sf, lit("all"),
      Drift.bucketize(length(col("content")), 0, 5000, 40))
    val ref = hist.groupBy("bucket").agg(sum("cnt").as("ref_cnt"))
    val psi = Drift.psi(hist, ref).collect().head.getDouble(1)
    val ks = Drift.ks(hist, ref).collect().head.getDouble(1)
    assert(math.abs(psi) < 1e-9)
    assert(math.abs(ks) < 1e-9)
  }

  test("wasserstein/jsd: identical -> 0; hand case; disjoint jsd = ln 2") {
    import spark.implicits._
    val hist0 = Drift.histogram(sf, lit("all"),
      Drift.bucketize(length(col("content")), 0, 5000, 40))
    val ref0 = hist0.groupBy("bucket").agg(sum("cnt").as("ref_cnt"))
    assert(math.abs(Drift.wasserstein(hist0, ref0, 125.0)
      .collect().head.getDouble(1)) < 1e-9)
    assert(math.abs(Drift.jsd(hist0, ref0).collect().head.getDouble(1)) < 1e-9)

    // p = (1, 0) vs q = (1/2, 1/2): CDF gaps (1/2, 0) -> W1 = w/2;
    // JSD = ln(4/3)/2 + ln(2/3)/4 + ln(2)/4
    val hist = Seq(("a", 0, 10L)).toDF("part", "bucket", "cnt")
    val ref = Seq((0, 5L), (1, 5L)).toDF("bucket", "ref_cnt")
    val w1 = Drift.wasserstein(hist, ref, 30.0).collect().head.getDouble(1)
    assert(math.abs(w1 - 15.0) < 1e-9)
    val j = Drift.jsd(hist, ref).collect().head.getDouble(1)
    val expect = math.log(4.0 / 3) / 2 + math.log(2.0 / 3) / 4 + math.log(2) / 4
    assert(math.abs(j - expect) < 1e-12, s"$j vs $expect")

    // disjoint support saturates at ln 2 (JSD's bound). NB the grid is the
    // REF bucket set, so the ref histogram must enumerate the part's bucket
    // (with ref_cnt 0) for its mass to be seen — same boundary-evaluation
    // rule as ks().
    val dis = Seq(("a", 0, 7L)).toDF("part", "bucket", "cnt")
    val disRef = Seq((0, 0L), (1, 3L)).toDF("bucket", "ref_cnt")
    val jd = Drift.jsd(dis, disRef).collect().head.getDouble(1)
    assert(math.abs(jd - math.log(2)) < 1e-12, s"$jd")
  }

  test("sha256 invariant matches reference implementation") {
    val h = sf.limit(1).select(col("content"),
      TableChecks.sha256(col("content")).as("h")).collect().head
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest(h.getString(0).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(h.getString(1) == expect)
  }

  test("exact-KS Aggregator equals the histogram closed form on discrete values") {
    import spark.implicits._
    // property: over an already-discrete metric, the unbucketed Aggregator
    // and the bucket-histogram Window form compute the SAME statistic
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { _ =>
      (s"p${rnd.nextInt(4)}", rnd.nextInt(20))
    }
    val df = rows.toDF("part", "v")
    val hist = Drift.histogram(df, col("part"), col("v"))
    val ref = hist.groupBy("bucket").agg(sum("cnt").as("ref_cnt"))
    val hks = Drift.ks(hist, ref).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact form per part: sample A = the part's rows, sample B = all rows
    val parts = rows.map(_._1).distinct
    val tagged = parts.flatMap { p =>
      rows.filter(_._1 == p).map(r => (p, r._2.toDouble, false)) ++
        rows.map(r => (p, r._2.toDouble, true))
    }.toDF("part", "v", "isRef")
    val eks = tagged.groupBy("part")
      .agg(Drift.exactKs(col("v"), col("isRef")).as("ks"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    parts.foreach { p =>
      assert(math.abs(hks(p) - eks(p)) < 1e-12, s"part $p: ${hks(p)} vs ${eks(p)}")
    }
  }

  test("violationDiff: new/fixed/persisting, null-safe identity, dedup") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("field", StringType), StructField("vtype", StringType)))
    def df(rows: Seq[(Any, String, String)]) = spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (a, b, c) => Row(a, b, c) }, 2), schema)
    val cur = df(Seq((1L, "f", "t"), (1L, "f", "t"), // dup collapses
      (null, "k", "missing"), (2L, "f", "t")))
    val prev = df(Seq((1L, "f", "t"), (null, "k", "missing"),
      (3L, "g", "u")))
    val out = graft.checks.TableChecks
      .violationDiff(cur, prev, Seq("id", "field", "vtype"))
      .collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getString(2)) ->
        r.getString(3)).toMap
    assert(out == Map(
      (Some(1L), "f", "t") -> "persisting",
      (None, "k", "missing") -> "persisting", // null id pairs null-safely
      (Some(2L), "f", "t") -> "new",
      (Some(3L), "g", "u") -> "fixed"))
    assert(out.size == 4)
  }

  test("freshness: exact micros lag, stale flag, global max has lag 0") {
    import spark.implicits._
    val df = Seq(
      ("a", "2024-01-01 00:00:00.000001"),
      ("a", "2024-01-01 01:00:00.500000"),
      ("b", "2024-01-01 00:30:00.250000"),
      ("c", "2024-01-01 01:00:00.500000"))
      .toDF("part", "s").select(col("part"), col("s").cast("timestamp").as("ts"))
    val out = TableChecks.freshness(df, col("part"), col("ts"), 1200L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getLong(3) == 0L && out("a").getInt(4) == 0)
    assert(out("c").getLong(3) == 0L)
    // b lags 30min 0.25s = 1800250000 us > 20min -> stale
    assert(out("b").getLong(3) == 1800250000L && out("b").getInt(4) == 1)
  }

  test("anomalyScan: drifted repo flagged, normal repos not, MAD=0 null") {
    import spark.implicits._
    val out = TableChecks.anomalyScan(sf, col("repo"), length(col("content")))
      .collect().map(r => r.getString(0) -> r).toMap
    // repo 7 is the generator's drifted repo (content lengths shifted 4x)
    val drifted = out("org7/repo7")
    assert(drifted.getInt(5) == 1 && drifted.getDouble(4) > 3.5)
    // the anomaly set is small — population scoring doesn't flag the bulk
    assert(out.values.count(r => !r.isNullAt(5) && r.getInt(5) == 1) <
      out.size / 20)
    // exact-hand case: 5 parts, means 10,10,10,10,100 -> median 10, devs
    // 0,0,0,0,90 -> MAD 0 -> mod_z/anomaly null everywhere
    val flat = Seq(("a", 10), ("b", 10), ("c", 10), ("d", 10), ("e", 100))
      .toDF("p", "len")
    val z = TableChecks.anomalyScan(flat, col("p"), col("len")).collect()
    assert(z.forall(r => r.isNullAt(4) && r.isNullAt(5)))
    // exact-hand case: means 1..5 -> median 3, devs 2,1,0,1,2 -> MAD 1;
    // mod_z(5) = 0.6745*2/1 = 1.349
    val lin = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5))
      .toDF("p", "len")
    val m = TableChecks.anomalyScan(lin, col("p"), col("len"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("e").getDouble(4) == 0.6745 * 2 &&
      m("c").getDouble(4) == 0.0 && m("e").getInt(5) == 0)
  }

  test("exactQuantiles: nearest-rank on hand-computed sets (ties, n=1, p100)") {
    import spark.implicits._
    // g1: values 1..4 -> n=4: p50 rank ceil(2)=2 -> 2; p75 rank 3 -> 3;
    // p100 rank 4 -> 4. g2: single value. g3: heavy ties 5,5,5,9 ->
    // p50 rank 2 -> 5; p75 rank 3 -> 5; p100 -> 9.
    val df = (Seq(("g1", 1), ("g1", 2), ("g1", 3), ("g1", 4), ("g2", 7)) ++
      Seq(("g3", 5), ("g3", 5), ("g3", 5), ("g3", 9))).toDF("g", "v")
    val rows = TableChecks.exactQuantiles(df, col("g"), col("v"),
        Seq(("p50", 1, 2), ("p75", 3, 4), ("p100", 1, 1)))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2))
    // exactly one row per (group, q) — the rank-crossing filter is a
    // partition of the rank space, never zero or duplicate matches
    // (assert BEFORE collapsing to a Map, which would mask duplicates)
    assert(rows.length === 9)
    val out = rows.toMap
    assert(out === Map(
      ("g1", "p50") -> 2, ("g1", "p75") -> 3, ("g1", "p100") -> 4,
      ("g2", "p50") -> 7, ("g2", "p75") -> 7, ("g2", "p100") -> 7,
      ("g3", "p50") -> 5, ("g3", "p75") -> 5, ("g3", "p100") -> 9))
    // null values are excluded like approx_percentile (and unlike a
    // naive count — Spark orders nulls first, DuckDB last)
    val withNulls = (Seq(("g1", Some(1)), ("g1", None), ("g1", Some(3))))
      .toDF("g", "v")
    val q50 = TableChecks.exactQuantiles(withNulls, col("g"), col("v"),
      Seq(("p50", 1, 2))).collect()
    assert(q50.length === 1 && q50.head.getInt(2) === 1) // median of {1,3}
  }
}
