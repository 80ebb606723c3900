package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.dedup.Dedup
import graft.text.{CodeOps, TextOps}

/** r06 profiling scratchpad: stage-by-stage splits of heavy operators
 * (guide §1). Not part of any driver contract. */
object ProfOpt {
  def force(df: DataFrame): Long = df.queryExecution.toRdd.count()
  def time[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROF $tag%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  /** The r5 stripBoilerplate (explode + anti-join + regroup) for A/B. */
  def stripOld(df: DataFrame, idCol: String, contentCol: String,
               minDf: Long): DataFrame = {
    val lines = (c: org.apache.spark.sql.Column) => split(c, "\n", -1)
    val pos = df.select(col(idCol).as("id"),
        posexplode(lines(col(contentCol))).as(Seq("pos", "line")))
      .withColumn("lh", TextOps.hash60(col("line")))
    val dfreq = pos.where(trim(col("line")) =!= "")
      .select(col("id"), col("lh")).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("__df"))
    val rebuilt = pos
      .join(dfreq.where(col("__df") >= minDf), Seq("lh"), "left_anti")
      .groupBy(col("id"))
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line")), "\n").as("content"))
    df.select(col(idCol).as("id")).join(rebuilt, Seq("id"), "left")
      .select(col("id"), coalesce(col("content"), lit("")).as("content"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.install(spark)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.OFF)

    val code = spark.read.parquet("/tmp/graft_code_input_v1")
    val keep = CodeOps.codeFilter(
        CodeOps.codeQuality(code, "id", "lang", "content"))
      .filter(col("keep")).select("id")
    val gated = code.join(keep, "id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"gated: ${gated.count()}")

    // A/B stripBoilerplate (warm both once, then timed)
    time("strip_new_warm") {
      force(CodeOps.stripBoilerplate(gated, "id", "content", 20L))
    }
    time("strip_old_warm") { force(stripOld(gated, "id", "content", 20L)) }
    time("strip_new") {
      force(CodeOps.stripBoilerplate(gated, "id", "content", 20L))
    }
    time("strip_old") { force(stripOld(gated, "id", "content", 20L)) }
    time("strip_new2") {
      force(CodeOps.stripBoilerplate(gated, "id", "content", 20L))
    }
    time("strip_old2") { force(stripOld(gated, "id", "content", 20L)) }

    // code-norm jaccard candidate volume with/without positional filter
    val norm = CodeOps.nearDupNorm(gated)
    import org.apache.spark.sql.expressions.Window
    val sh0 = Dedup.shingleRows(norm, "id", "norm", 3).distinct()
      .select(col("id"), TextOps.hash60(col("sh")).as("sh"))
    val dfreq = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
    val wId = Window.partitionBy("id")
    val ranked = sh0.join(dfreq, "sh")
      .withColumn("rk", row_number().over(wId.orderBy(col("df"), col("sh"))))
      .withColumn("sz", count(lit(1)).over(wId))
      .select(col("id"), col("sh"), col("sz"), col("rk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"ranked: ${ranked.count()}")
    val ceilT = (lit(1L) * col("sz") + lit(1L)) / lit(2L)
    val prefix = ranked
      .filter(col("rk") <= col("sz") - ceilT.cast(LongType) + 1)
      .select(col("id"), col("sh"), col("sz"), col("rk"))
    val base = col("x.sh") === col("y.sh") && col("x.id") < col("y.id") &&
      lit(1L) * col("x.sz") <= lit(2L) * col("y.sz") &&
      lit(1L) * col("y.sz") <= lit(2L) * col("x.sz")
    val ub = lit(1L) +
      least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk"))
    println("cand rows no-pos: " + prefix.as("x").join(prefix.as("y"), base)
      .count())
    println("cand rows with-pos: " + prefix.as("x").join(prefix.as("y"),
      base && lit(2L) * ub >= lit(1L) * (col("x.sz") + col("y.sz") - ub))
      .count())
    println("cand pairs no-pos: " + prefix.as("x").join(prefix.as("y"), base)
      .select(col("x.id"), col("y.id")).distinct().count())
    println("cand pairs with-pos: " + prefix.as("x").join(prefix.as("y"),
      base && lit(2L) * ub >= lit(1L) * (col("x.sz") + col("y.sz") - ub))
      .select(col("x.id"), col("y.id")).distinct().count())
    spark.stop()
  }
}
