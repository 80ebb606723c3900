package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

import graft.compile.ModelValidator
import graft.spec.ModelSpec

/**
 * Streaming validation — Structured Streaming over arriving data.
 *
 * Reference anchor (SURVEY §2.6): pydantic's partial validation for
 * streamed JSON (`allow_partial`, `validators/mod.rs:183-304`) plus the
 * plugin observability hooks (`pydantic/plugin/__init__.py:76-186`). The
 * columnar generalization: the SAME compiled constraint plan applied per
 * microbatch (stateless projection — it attaches to a streaming DataFrame
 * unchanged), with watermarked windowed aggregation as the observability
 * stream (violation rates over event time).
 *
 * Exactly-once at scale: the violations sink relies on Spark's own
 * checkpointing (offsets + file-sink transaction log) — the streaming
 * counterpart of run.Runner's ledger.
 */
object StreamValidator {

  /** Attach the compiled validation plan to a (streaming or batch)
   * DataFrame: adds coerced fields, `violations`, `valid`. Stateless, so
   * it works identically under both execution modes. */
  def validate(stream: DataFrame, model: ModelSpec): DataFrame =
    ModelValidator.plan(stream, model)

  /** Exploded violation rows of a streaming DataFrame. */
  def violations(stream: DataFrame, model: ModelSpec,
                 keyCols: Seq[String]): DataFrame =
    ModelValidator.violations(stream, model, keyCols)

  /** Observability stream: per-event-time-window row/violation counts with
   * a watermark (late data beyond `lateness` is dropped, state is bounded —
   * mandatory for an unbounded 100TB/day stream). */
  def violationRateByWindow(stream: DataFrame, model: ModelSpec,
                            tsCol: String, windowDuration: String,
                            lateness: String = "10 minutes"): DataFrame =
    validate(stream, model)
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(
        count(lit(1)).as("row_count"),
        sum(size(col(ModelValidator.VIOLATIONS))).as("violation_count"),
        sum(when(col(ModelValidator.VALID), 0L).otherwise(1L)).as("invalid_rows"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("row_count"), col("violation_count"), col("invalid_rows"))

  /** File-based streaming ingest: watch `sourceDir` for arriving parquet
   * (the Iceberg-snapshot-tailing analog in the sandbox), validate, and
   * write the violation sink with exactly-once file-sink semantics. */
  def runFileStream(spark: org.apache.spark.sql.SparkSession,
                    sourceDir: String, schema: StructType, model: ModelSpec,
                    keyCols: Seq[String], outDir: String,
                    checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] = {
    val in = spark.readStream.schema(schema).parquet(sourceDir)
    violations(in, model, keyCols)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
  }
}
