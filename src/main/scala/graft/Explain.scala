package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: dump `.explain("formatted")` for representative queries so
 * scan pruning (ReadSchema), filter pushdown (PushedFilters), broadcast
 * choices and WholeStageCodegen spans can be reviewed. Findings recorded
 * in BENCH.md §plan-audit. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("v_verdict", "z_dump_proj", "v_ri_lang", "q_join_agg",
        "d_minhash_lsh", "v_drift_psi", "d_jaccard_ngram", "s_ann_multi",
        "s_near_dup", "v_json_partial", "s_ann_ivf", "q_named_tuple",
        "e_asof", "e_sessions", "e_range", "q_topk", "v_quantiles",
        "p_code_clean", "w_index", "w_bm25", "w_triangles", "t_ppl",
        "t_dup_spans")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    // the headline validation plan over the synthetic generator
    println("\n========== validation (generated input) ==========")
    val gen = graft.data.SourceFilesGen.generate(spark, 1000L)
    graft.compile.ModelValidator.plan(gen, Bench.sourceFileModel)
      .explain("formatted")
    spark.stop()
  }
}
