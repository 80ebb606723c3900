package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.serialize.Serializer
import graft.spec._

/**
 * Property-based tests — reference parity with
 * `pydantic-core/tests/test_hypothesis.py` (SURVEY §5): roundtrip
 * (validate ∘ serialize = id on valid data), constraint monotonicity,
 * coercion laws. Plus the strict-mode 3-way matrix of
 * `pydantic-core/tests/conftest.py:114-129`.
 */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  test("property: every prefix of valid JSON recovers to PARSEABLE JSON (or null)") {
    // random JSON docs from a small generator, truncated at EVERY position;
    // invariant: JsonPartial.complete output must parse (try_parse_json
    // non-null) in both modes whenever non-null, and the full-length input
    // must recover to a document equal to itself modulo whitespace
    val leaf = org.scalacheck.Gen.oneOf(
      org.scalacheck.Gen.chooseNum(-999, 999).map(_.toString),
      org.scalacheck.Gen.alphaStr.map(a => "\"" + a.take(6) + "\""),
      org.scalacheck.Gen.oneOf("true", "false", "null"))
    def docGen(depth: Int): org.scalacheck.Gen[String] =
      if (depth <= 0) leaf
      else org.scalacheck.Gen.oneOf(
        leaf,
        org.scalacheck.Gen.listOfN(2, docGen(depth - 1))
          .map(_.mkString("[", ", ", "]")),
        org.scalacheck.Gen.listOfN(2, docGen(depth - 1)).map(vs =>
          vs.zipWithIndex.map { case (v, i) => s"\"k$i\": $v" }
            .mkString("{", ", ", "}")))
    val docs = org.scalacheck.Gen.listOfN(25, docGen(3)).sample.get
    val prefixes = docs.flatMap(d => (1 to d.length).map(d.substring(0, _)))
    val df = prefixes.toDF("c")
    val out = df.select(col("c"),
      graft.functions.JsonPartialOps.completeJson(col("c")).as("on"),
      graft.functions.JsonPartialOps.completeJson(col("c"),
        trailingStrings = true).as("ts"),
      try_parse_json(graft.functions.JsonPartialOps.completeJson(col("c")))
        .isNull.as("on_bad"),
      try_parse_json(graft.functions.JsonPartialOps.completeJson(col("c"),
        trailingStrings = true)).isNull.as("ts_bad"))
      .collect()
    out.foreach { r =>
      val c = r.getString(0)
      if (!r.isNullAt(1))
        assert(!r.getBoolean(3), s"mode-on output unparseable for prefix '$c': '${r.getString(1)}'")
      if (!r.isNullAt(2))
        assert(!r.getBoolean(4), s"ts output unparseable for prefix '$c': '${r.getString(2)}'")
    }
    // full-length inputs: recovery is the identity
    val fulls = docs.toDF("c").select(col("c"),
      graft.functions.JsonPartialOps.completeJson(col("c")).as("on")).collect()
    fulls.foreach(r => assert(r.getString(1) == r.getString(0)))
  }


  // batch generated cases into ONE Spark job per property (a job per
  // sample would be minutes of overhead)
  private def intResults(spec: Spec, values: Seq[Long]): Seq[Seq[String]] =
    types(spec, LongType, values)

  test("property: int bound violations are exactly the complement of the bound") {
    val values = Gen.listOfN(200, Gen.chooseNum(-1000L, 1000L)).sample.get
    val gt = 17L
    val got = intResults(IntSpec(gt = Some(gt)), values)
    values.zip(got).foreach { case (v, viols) =>
      assert(viols.contains("greater_than") == (v <= gt),
        s"v=$v viols=$viols")
    }
  }

  test("property: tightening a constraint never un-flags a row (monotonicity)") {
    val values = Gen.listOfN(100, Gen.chooseNum(-100L, 100L)).sample.get
    val loose = intResults(IntSpec(ge = Some(0L)), values)
    val tight = intResults(IntSpec(ge = Some(50L)), values)
    loose.zip(tight).foreach { case (l, t) =>
      assert(l.isEmpty || t.nonEmpty) // flagged by loose => flagged by tight
    }
  }

  test("property: str->int lax coercion roundtrips rendered longs") {
    val values = Gen.listOfN(150, Gen.chooseNum(Long.MinValue / 2,
      Long.MaxValue / 2)).sample.get
    val got = run(IntSpec(), StringType, values.map(_.toString))
    values.zip(got).foreach { case (v, (coerced, viols)) =>
      assert(viols.isEmpty && coerced == v)
    }
  }

  test("property: connectedComponents equals driver-side union-find on random graphs") {
    // both algorithms (large-star/small-star default + min-label) against
    // union-find, across several random graph densities
    for (seed <- Seq(7, 11, 23)) {
      val rnd = new scala.util.Random(seed)
      val edges = (1 to 60).map(_ =>
        (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter(e => e._1 != e._2).distinct
      // reference: union-find with union-by-min (root is the component min)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      for (algo <- Seq("star", "minlabel")) {
        val df = edges.toDF("id_a", "id_b")
        val got = (if (algo == "star")
          graft.dedup.Dedup.connectedComponents(df)
        else graft.dedup.Dedup.connectedComponentsMinLabel(df))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got.keySet == nodes.toSet, s"$algo seed=$seed")
        nodes.foreach { n =>
          assert(got(n) == find(n), s"$algo seed=$seed node $n") }
      }
    }
  }

  test("connectedComponents: long path converges in O(log^2) rounds; " +
    "min-label past its diameter cap throws instead of partial labels") {
    // a 120-node path has diameter 119 — label propagation needs ~119
    // rounds; the star contraction stays well inside its default cap
    val path = (0L until 119L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup.connectedComponents(path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 120 && got.values.forall(_ == 0L))
    // the ADVICE-flagged failure mode: min-label at maxIter must FAIL
    // LOUDLY, never silently return non-converged labels
    val ex = intercept[IllegalStateException] {
      graft.dedup.Dedup.connectedComponentsMinLabel(path, maxIter = 5)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponents: probeEvery batching returns identical labels " +
    "(star forest is a fixpoint, so a late probe still sees convergence)") {
    val rnd = new scala.util.Random(31)
    val edges = ((0L until 59L).map(i => (i, i + 1)) ++ // 60-node path
      (1 to 40).map(_ => (rnd.nextInt(30).toLong + 100L,
        rnd.nextInt(30).toLong + 100L))).filter(e => e._1 != e._2)
      .distinct.toDF("id_a", "id_b")
    val every1 = graft.dedup.Dedup
      .connectedComponents(edges, probeEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (pe <- Seq(2, 3, 5)) {
      val got = graft.dedup.Dedup
        .connectedComponents(edges, probeEvery = pe)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == every1, s"probeEvery=$pe")
    }
  }

  test("connectedComponents: self-pairs yield singleton components; " +
    "reliable checkpoint dir path works") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_cc_ckpt").toString
    val pairs = Seq((5L, 5L), (1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = graft.dedup.Dedup
      .connectedComponents(pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(5L -> 5L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("property: fraction parse ∘ render = id on random rationals") {
    val pairs = Gen.listOfN(120, for {
      n <- Gen.chooseNum(-1000000L, 1000000L)
      d <- Gen.chooseNum(1L, 1000000L)
    } yield (n, d)).sample.get
    val reduced = pairs.map { case (n, d) =>
      val r = graft.functions.FractionReduce.reduce(n, d); (r(0), r(1))
    }
    val rendered = reduced.map { case (n, d) =>
      if (d == 1) n.toString else s"$n/$d"
    }
    val got = run(FractionSpec(), StringType, rendered)
    reduced.zip(got).foreach { case ((n, d), (v, viols)) =>
      assert(viols.isEmpty)
      val row = v.asInstanceOf[Row]
      assert((row.getLong(0), row.getLong(1)) == ((n, d)))
    }
  }

  test("property: complex parse ∘ render = id on bounded random doubles") {
    // decimal(38,18) keeps >= 17 significant digits in this range, which
    // uniquely identifies a double — so render-then-parse must be exact
    val vals = Gen.listOfN(80, for {
      re <- Gen.chooseNum(-1e6, 1e6)
      im <- Gen.chooseNum(-1e6, 1e6)
    } yield (re, im)).sample.get
    val renderedDf = vals.toDF("re", "im")
      .select(Serializer.complexJson(struct(col("re"), col("im"))))
      .as[String].collect().toSeq
    val got = run(ComplexSpec, StringType, renderedDf)
    vals.zip(got).zip(renderedDf).foreach { case (((re, im), (v, viols)), s) =>
      assert(viols.isEmpty, s"$s")
      val row = v.asInstanceOf[Row]
      assert(row.getDouble(0) == re && row.getDouble(1) == im,
        s"$s -> (${row.getDouble(0)}, ${row.getDouble(1)}) != ($re, $im)")
    }
  }

  test("property: serialize ∘ validate = id on valid rows (roundtrip)") {
    val model = ModelSpec("m", Seq(
      FieldSpec("a", IntSpec()), FieldSpec("b", StrSpec())))
    val rows = Gen.listOfN(80,
      Gen.zip(Gen.chooseNum(-1000000L, 1000000L),
        Gen.alphaNumStr.map(_.take(40)))).sample.get
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2), schema)
    val ok = df.select(Serializer.roundTripOk(df, model).as("ok"))
      .collect().forall(_.getBoolean(0))
    assert(ok)
  }

  // --- strict-mode matrix (conftest.py:114-129: strict-schema /
  // strict-call / both agree on outcomes)
  test("strict matrix: spec-level strict == call-level strict == both") {
    val values: Seq[Any] = Seq("42", 42L)
    def outcome(specStrict: Option[Boolean], mode: Mode) = {
      val schemaStr = types(IntSpec(strict = specStrict), StringType,
        Seq("42"), mode).head
      val schemaInt = types(IntSpec(strict = specStrict), LongType,
        Seq(42L), mode).head
      (schemaStr, schemaInt)
    }
    val specLevel = outcome(Some(true), Mode.Lax)
    val callLevel = outcome(None, Mode.Strict)
    val both = outcome(Some(true), Mode.Strict)
    assert(specLevel == callLevel && callLevel == both)
    assert(specLevel._1 == Seq("int_type")) // strict rejects string input
    assert(specLevel._2 == Nil)             // exact int passes
    // spec-level strict=false OVERRIDES call-level strict (types.py:123:
    // per-field Strict metadata wins over the call mode)
    val overridden = types(IntSpec(strict = Some(false)), StringType,
      Seq("42"), Mode.Strict).head
    assert(overridden == Nil)
  }

  test("property: Definitions.unroll terminates on random cyclic ref graphs and is ref-free within budget") {
    def containsRef(s: Spec): Boolean = s match {
      case _: RefSpec => true
      case NullableSpec(i) => containsRef(i)
      case w: WithDefaultSpec => containsRef(w.inner)
      case ChainSpec(ss) => ss.exists(containsRef)
      case u: UnionSpec => u.choices.exists(containsRef)
      case t: TaggedUnionSpec => t.choices.exists(p => containsRef(p._2))
      case l: ListSpec => containsRef(l.item)
      case m: ModelSpec => m.fields.exists(f => containsRef(f.spec))
      case _ => false
    }
    val leaves: Gen[Spec] = Gen.oneOf(IntSpec(), StrSpec(), AnySpec, NoneSpec)
    val names = Seq("A", "B", "C")
    def nodeGen(depth: Int): Gen[Spec] =
      if (depth <= 0) Gen.oneOf(leaves, Gen.oneOf(names).map(RefSpec.apply))
      else Gen.frequency(
        3 -> Gen.oneOf(names).map(RefSpec.apply),
        2 -> leaves,
        2 -> nodeGen(depth - 1).map(NullableSpec.apply),
        2 -> Gen.listOfN(2, nodeGen(depth - 1)).map(ss => ChainSpec(ss)),
        2 -> nodeGen(depth - 1).map(i =>
          ModelSpec("m", Seq(FieldSpec("f", i)))),
        1 -> nodeGen(depth - 1).map(i => ListSpec(i)))
    val graphGen = for {
      a <- nodeGen(2); b <- nodeGen(2); c <- nodeGen(2); root <- nodeGen(2)
    } yield (Map("A" -> a, "B" -> b, "C" -> c), root)
    val samples = Gen.listOfN(60, graphGen).sample.get
    samples.foreach { case (defs, root) =>
      // terminates (budget bounds every cycle) and leaves NO RefSpec:
      // every ref is either expanded or cut to AnySpec
      val out = Definitions.unroll(root, defs, budget = 5)
      assert(!containsRef(out))
      // idempotent: a second unroll is a no-op
      assert(Definitions.unroll(out, defs, budget = 5) == out)
      // monotone in budget at budget >= depth of finite graphs: unrolling
      // with a bigger budget only ever swaps AnySpec cuts for more spec
      val out2 = Definitions.unroll(root, defs, budget = 8)
      assert(!containsRef(out2))
    }
  }

  test("property: triangles equals brute-force enumeration on random " +
    "graphs") {
    import graft.web.LinkGraph
    for (seed <- Seq(3, 17, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 25
      val edges = (1 to 70).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val adj = edges.flatMap(e => Seq(e, e.swap)).toSet
      def conn(a: Long, b: Long) = adj.contains((a, b))
      val brute = (0L until n).map { v =>
        val cnt = (for {
          a <- 0L until n; b <- (a + 1) until n
          if a != v && b != v && conn(v, a) && conn(v, b) && conn(a, b)
        } yield 1).size.toLong
        v -> cnt
      }.toMap
      val deg = (0L until n).map(v =>
        v -> (0L until n).count(u => u != v && conn(v, u)).toLong).toMap
      val got = LinkGraph.triangles(edges.toDF("src", "dst"),
        (0L until n).toDF("node"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      (0L until n).foreach { v =>
        assert(got(v) == ((deg(v), brute(v))), s"seed=$seed node $v") }
    }
  }

  test("property: kCore equals brute-force iterated peeling on random " +
    "graphs, k in 2..4") {
    import graft.web.LinkGraph
    for (seed <- Seq(5, 29); k <- 2 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = (1 to 90).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val und = edges.map(e =>
        (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
      var alive = (0L until n).toSet
      var changed = true
      while (changed) {
        val deg = alive.map(v => v -> und.count(e =>
          (e._1 == v && alive(e._2)) || (e._2 == v && alive(e._1))).toLong)
          .toMap
        val next = alive.filter(v => deg(v) >= k)
        changed = next != alive; alive = next
      }
      val got = LinkGraph.kCore(edges.toDF("src", "dst"),
        (0L until n).toDF("node"), k)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      (0L until n).foreach { v =>
        assert(got(v) == alive(v), s"seed=$seed k=$k node $v") }
    }
  }

  test("property: trustRank is bounded by pageRank-style mass and zero " +
    "off the seed reachability set") {
    import graft.web.LinkGraph
    for (seed <- Seq(13, 31)) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = (1 to 60).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val seeds = (0L until n by 5)
      // driver-side reachability from the seed set
      val out = edges.groupBy(_._1).map { case (k2, v) => k2 -> v.map(_._2) }
      var reach = seeds.toSet
      var grew = true
      while (grew) {
        val next = reach ++ reach.flatMap(v => out.getOrElse(v, Nil))
        grew = next != reach; reach = next
      }
      val got = LinkGraph.trustRank(edges.toDF("src", "dst"),
        (0L until n).toDF("node"), seeds.toDF("node"), iterations = 6,
        scale = 1000000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until n).foreach { v =>
        if (!reach(v)) assert(got(v) == 0L, s"seed=$seed node $v")
        else assert(got(v) >= 0L, s"seed=$seed node $v")
      }
      // total trust mass is conserved-with-damping: floor arithmetic only
      // loses mass, so the sum never exceeds |seeds| * scale
      assert(got.values.sum <= seeds.size * 1000000L, s"seed=$seed mass")
      // every seed keeps at least its teleport share
      seeds.foreach(sd => assert(got(sd) >= 150000L, s"seed node $sd"))
    }
  }
}
