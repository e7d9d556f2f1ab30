package graft.sources

import org.apache.hadoop.io.{BytesWritable, Text}
import org.apache.hadoop.mapred.SequenceFileOutputFormat
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Hive `STORED AS SEQUENCEFILE` parity: SequenceFile<BytesWritable, Text>
  * container whose value is a LazySimpleSerDe-delimited line (\x01 field
  * separator, `\N` for NULL) and whose key is ignored — byte-compatible
  * with what the reference writes for its default sequencefile tables
  * (io/HiveSequenceFileOutputFormat.java + serde2/lazy/LazySimpleSerDe.java).
  *
  * Scale design: write is a narrow map → one sequence file per partition via
  * the Hadoop committer; read is sc.sequenceFile (block-splittable, unlike
  * plain gzip text) re-parsed by Spark's csv reader with the \x01 dialect,
  * so schema coercion/permissive-null behavior is shared with q106/q107.
  */
object SequenceFileText {

  private val SEP = "\u0001"

  def write(df: DataFrame, dir: String): Unit = {
    val cols = df.columns.map(c => coalesce(col(c).cast("string"), lit("\\N")))
    val lines = df.select(concat_ws(SEP, cols: _*).as("line"))
    lines.rdd.map(r => (new BytesWritable(Array.emptyByteArray), new Text(r.getString(0))))
      .saveAsHadoopFile(dir, classOf[BytesWritable], classOf[Text],
        classOf[SequenceFileOutputFormat[BytesWritable, Text]])
  }

  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    // convert the Writables inside the scan task (Text is not serializable)
    val lines = spark.sparkContext
      .sequenceFile(dir, classOf[BytesWritable], classOf[Text])
      .map(_._2.toString)
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, split, when}
    val ds: Dataset[String] = spark.createDataset(lines)
    // explicit split-and-cast, NOT the CSV reader: LazySimpleSerDe
    // distinguishes an EMPTY field ('') from the \N null marker, while
    // the csv parser returns null for unquoted empty fields no matter
    // what — a written "" must round-trip as "", only \N as NULL.
    // split limit -1 keeps trailing empty fields; a missing trailing
    // field (short line) still reads as null via out-of-bounds access.
    val arr = ds.select(
      split(col("value"), java.util.regex.Pattern.quote(SEP), -1).as("f"))
    arr.select(schema.fields.zipWithIndex.map { case (fld, i) =>
      when(col("f")(i) === "\\N", lit(null))
        .otherwise(col("f")(i)).cast(fld.dataType).as(fld.name)
    }: _*)
  }
}
