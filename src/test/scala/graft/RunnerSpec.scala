package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.data.SourceFilesGen
import graft.run.Runner

class RunnerSpec extends SparkTestBase
    with org.scalatest.BeforeAndAfterAll {

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[String]

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-run").toString
    tempDirs += d
    d
  }

  override def afterAll(): Unit = {
    tempDirs.foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    super.afterAll()
  }

  lazy val input = SourceFilesGen.generate(spark, 5000L).cache()
  val model = Bench.sourceFileModel

  test("run commits every bucket with lineage + metrics") {
    val out = freshDir()
    val report = Runner.run(spark, input, model, "repo", "content", out,
      buckets = 8, waveSize = 3)
    assert(report.skipped.isEmpty)
    assert(report.ran.sorted == (0 until 8))
    val res = Runner.results(spark, out)
    assert(res.count() == 8)
    val total = res.agg(sum("row_count")).collect().head.getLong(0)
    assert(total == 5000L)
    // violations exist (generator injects them) and are ledger-gated
    assert(Runner.violations(spark, out).count() > 0)
    // spec hash recorded on every row
    assert(res.filter(col("spec_hash") === Runner.specHash(model)).count() == 8)
  }

  test("resume skips completed partitions; tampered ledger re-runs only the hole") {
    val out = freshDir()
    val r1 = Runner.run(spark, input, model, "repo", "content", out,
      buckets = 8, waveSize = 8)
    assert(r1.ran.size == 8)
    // full resume: nothing to do
    val r2 = Runner.run(spark, input, model, "repo", "content", out,
      buckets = 8, waveSize = 8)
    assert(r2.ran.isEmpty && r2.skipped.size == 8)
    // simulate a killed wave: drop the ledger, keep data files
    val ledger = Paths.get(out, "ledger")
    Files.list(ledger).forEach(p => Files.delete(p))
    val r3 = Runner.run(spark, input, model, "repo", "content", out,
      buckets = 8, waveSize = 8)
    assert(r3.ran.size == 8) // all re-validated, attempt bumped
    val res = Runner.results(spark, out)
    assert(res.count() == 8)
  }

  test("sha checksum is deterministic across runs (reference-run invariant)") {
    val out1 = freshDir(); val out2 = freshDir()
    Runner.run(spark, input, model, "repo", "content", out1, buckets = 4)
    Runner.run(spark, input, model, "repo", "content", out2, buckets = 4)
    val a = Runner.results(spark, out1)
      .select("part_id", "sha_checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Runner.results(spark, out2)
      .select("part_id", "sha_checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.size == 4)
  }

  test("stageBuckets restages when the bucket count changes (no stale 0-row passes)") {
    val out = freshDir()
    Runner.run(spark, input, model, "repo", "content", out,
      buckets = 4, stageBuckets = true)
    // resume under buckets=8: parts 4..7 are pending. A stale reuse of the
    // b=4 staged copy (whose __part ids stop at 3) would commit them as
    // passed with 0 rows — the staging path embeds the bucket count, so
    // this run restages and the new parts carry real rows.
    val r = Runner.run(spark, input, model, "repo", "content", out,
      buckets = 8, stageBuckets = true)
    assert(r.ran.nonEmpty)
    val newRows = Runner.results(spark, out)
      .filter(col("part_id").isin(r.ran: _*))
      .agg(sum("row_count")).collect().head.getLong(0)
    assert(newRows > 0,
      "changed-bucket resume must restage, not reuse the old staged copy")
  }

  test("spec change invalidates completed partitions (lineage keyed by spec hash)") {
    val out = freshDir()
    Runner.run(spark, input, model, "repo", "content", out, buckets = 4)
    val changed = model.copy(fields = model.fields.take(3))
    val r = Runner.run(spark, input, changed, "repo", "content", out, buckets = 4)
    assert(r.skipped.isEmpty && r.ran.size == 4)
  }

  test("regressionDiff across two committed runs: new/fixed/persisting") {
    val out = freshDir()
    // previous run: the canonical model
    Runner.run(spark, input, model, "repo", "content", out, buckets = 4)
    // current run: ruby removed from the lang enum (ruby rows -> NEW enum
    // violations) and the commit hex pattern dropped (its
    // string_pattern_mismatch rows -> FIXED); everything else persists
    val cur = model.copy(fields = model.fields.map {
      case f if f.name == "lang" =>
        f.copy(spec = graft.spec.EnumSpec(
          graft.data.SourceFilesGen.langs.filterNot(_ == "ruby")))
      case f if f.name == "commit" =>
        f.copy(spec = graft.spec.StrSpec(minLength = Some(40),
          maxLength = Some(40)))
      case f => f
    })
    Runner.run(spark, input, cur, "repo", "content", out, buckets = 4)
    val diff = Runner.regressionDiff(spark, out,
      Runner.specHash(cur), Runner.specHash(model)).cache()
    val byStatus = diff.groupBy("status", "type").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // ruby rows exist in the generated input -> new enum violations
    assert(byStatus.keys.exists { case (s, t) => s == "new" && t == "enum" })
    // the generator's corrupted-commit slice was pattern-flagged before
    assert(byStatus.keys.exists { case (s, t) =>
      s == "fixed" && t == "string_pattern_mismatch" })
    // unchanged constraints persist (e.g. null-path missing violations)
    assert(diff.filter(col("status") === "persisting").count() > 0)
    // no unexpected classes: every new row is the enum change, every
    // fixed row is the dropped pattern
    assert(byStatus.collect { case (("new", t), _) => t }.toSet == Set("enum"))
    assert(byStatus.collect { case (("fixed", t), _) => t }.toSet ==
      Set("string_pattern_mismatch"))
    diff.unpersist()
  }

  test("model_construct: checks-bypassed ingest is flagged, keeps lineage, " +
    "and never satisfies a later validation resume (main.py:331-405)") {
    val out = freshDir()
    val rc = Runner.run(spark, input, model, "repo", "content", out,
      buckets = 4, construct = true)
    assert(rc.ran.size == 4 && rc.failed.isEmpty)
    // ledger rows are flagged and carry the construct lineage marker
    val res = Runner.results(spark, out)
    assert(res.count() == 4)
    assert(res.filter(col("constructed")).count() == 4)
    assert(res.filter(col("spec_hash").endsWith(":construct")).count() == 4)
    // sha lineage preserved: same checksum a validation run computes
    val shaC = res.select("part_id", "sha_checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no violations were written
    assert(!Files.isDirectory(Paths.get(out, "violations")))
    // a later REAL validation does NOT skip construct-ingested buckets
    val rv = Runner.run(spark, input, model, "repo", "content", out,
      buckets = 4)
    assert(rv.skipped.isEmpty && rv.ran.size == 4)
    val resV = Runner.results(spark, out, Some(Runner.specHash(model)))
    val shaV = resV.select("part_id", "sha_checksum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shaC == shaV)
  }

  test("wave metrics bridge: per-wave rows/violations/wall + listener " +
    "counters land in the metrics table (plugin-hook analog)") {
    val out = freshDir()
    Runner.run(spark, input, model, "repo", "content", out,
      buckets = 8, waveSize = 3) // 3 waves: 3+3+2
    val m = Runner.metrics(spark, out)
    assert(m.count() == 3)
    assert(m.filter(col("status") === "success").count() == 3)
    val tot = m.agg(sum("rows"), sum("violations")).collect().head
    assert(tot.getLong(0) == 5000L)
    val res = Runner.results(spark, out)
    assert(tot.getLong(1) ==
      res.agg(sum("violation_count")).collect().head.getLong(0))
    // wall + listener counters present (listener bus is async: >= 0)
    assert(m.filter(col("wall_ms") >= 0).count() == 3)
    assert(m.filter(col("spark_queries") >= 0).count() == 3)
    assert(m.filter(col("constructed")).count() == 0)
  }
}
