package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample()` / TABLESAMPLE are seeded-RNG based: replayable within one
  * engine but not reproducible across engines or across repartitionings,
  * which makes corpus curation runs impossible to audit. The standard
  * pipeline answer is CONTENT-HASH sampling: a row is kept iff
  * md5(stable id) falls under a per-stratum threshold. Properties:
  *
  *   - deterministic: same row → same verdict, on any engine, any
  *     partitioning, any cluster size (the basis of the DuckDB oracle gate)
  *   - uniform: md5 is uniform over hex strings, so a threshold of the
  *     first two hex chars gives rate ≈ n/256 per stratum
  *   - embarrassingly parallel: narrow projection + filter, zero shuffle,
  *     all codegen'd built-ins — scales to 100 TB trivially
  *
  * Reference: sampling surface in the reference engine is
  * ql/parse/FromClauseParser.g TABLESAMPLE (covered by q42/q43/q98); this
  * operator is the pipeline-grade extension of it.
  */
object Sample {

  /** Per-stratum deterministic sample: keep a row of stratum s iff
    * md5(id)'s first two hex digits < rates(s)·256. Strata absent from
    * `rates` are dropped (rate 0).
    *
    * @param strata column whose string value picks the stratum
    * @param id     stable unique row identifier (hashed for the verdict)
    * @param rates  stratum → sampling fraction (quantized to 1/256 steps)
    */
  def stratified(df: DataFrame, strata: Column, id: Column,
                 rates: Map[String, Double]): DataFrame = {
    val bucket = substring(md5(id.cast("string").cast("binary")), 1, 2)
    // rate >= 1.0 → "zz": every 2-hex-char bucket sorts below it, so the
    // stratum is kept whole (hex digits never exceed 'f')
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (s, r)) =>
        val t = if (r >= 1.0) "zz" else f"${math.max(0, (r * 256).toInt)}%02x"
        when(strata === s, lit(t)).otherwise(acc)
    }
    df.filter(threshold.isNotNull && bucket < threshold)
  }

  /** Unstratified deterministic sample at `rate` (1/256 quantization). */
  def byHash(df: DataFrame, id: Column, rate: Double): DataFrame =
    stratified(df, lit("_"), id, Map("_" -> rate))
}
