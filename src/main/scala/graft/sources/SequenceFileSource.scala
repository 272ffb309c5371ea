package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.{BytesWritable, LongWritable, Text}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** Native Hadoop SequenceFile interop — the reference's
  * SequenceFile/WritableSequenceFile family (FileSource.scala:194-212)
  * read and written as REAL `org.apache.hadoop.io.SequenceFile`
  * key/value pairs, so data produced by existing sequence-file
  * pipelines migrates without a conversion step. Parquet
  * (ParquetSource/CodecSource) remains the recommended scale path for
  * NEW data — columnar pruning and pushdown don't exist here.
  *
  * Three concrete Writable shapes cover the reference's uses:
  *   - `readText`/`writeText` — Text/Text ⇔ (key string, value string)
  *   - `readLines` — LongWritable/Text ⇔ (offset long, line string),
  *     the TextLine-over-sequence-file shape
  *   - `readBytes`/`writeBytes` — BytesWritable/BytesWritable ⇔
  *     (key binary, value binary), the injection-codec record shape
  *     (pair with CodecSource decode functions)
  *
  * Scale shape: `sc.sequenceFile` is a splittable HadoopRDD — sync
  * blocks parallelize across executors exactly like any other
  * FileInputFormat. Hadoop REUSES Writable instances per record, so
  * every reader converts to an immutable value inside the first map,
  * before any buffering or shuffle.
  */
final case class SequenceFileSource(path: String) extends Source {

  def read(spark: SparkSession): DataFrame = readText(spark)

  def write(df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit =
    writeText(df, mode)

  /** Text/Text pairs as (key string, value string). */
  def readText(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext.sequenceFile(path, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString, v.toString) }
      .toDF("key", "value")
  }

  /** LongWritable/Text pairs as (offset long, line string). */
  def readLines(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[LongWritable], classOf[Text])
      .map { case (k, v) => (k.get(), v.toString) }
      .toDF("offset", "line")
  }

  /** BytesWritable/BytesWritable pairs as (key binary, value binary). */
  def readBytes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext
      .sequenceFile(path, classOf[BytesWritable], classOf[BytesWritable])
      .map { case (k, v) => (k.copyBytes(), v.copyBytes()) }
      .toDF("key", "value")
  }

  /** Writes the first two columns (cast to string) as Text/Text.
    * Null cells coalesce to the empty string — Text has no null form.
    */
  def writeText(df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val (k, v) = keyValueColumns(df, "writeText")
    if (prepare(df.sparkSession, mode)) {
      df.select(coalesce(col(k).cast("string"), lit("")),
          coalesce(col(v).cast("string"), lit("")))
        .rdd
        .map(r => (r.getString(0), r.getString(1)))
        .saveAsSequenceFile(path)
    }
  }

  /** Writes the first two binary columns as BytesWritable pairs.
    * Null cells coalesce to empty byte arrays — BytesWritable has no
    * null form.
    */
  def writeBytes(df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val (k, v) = keyValueColumns(df, "writeBytes")
    Seq(k, v).foreach { c =>
      require(df.schema(c).dataType ==
          org.apache.spark.sql.types.BinaryType,
        s"SequenceFileSource.writeBytes: column $c is " +
          s"${df.schema(c).dataType.simpleString}, expected binary")
    }
    if (prepare(df.sparkSession, mode)) {
      df.select(col(k), col(v)).rdd
        .map { r =>
          def bytes(i: Int): Array[Byte] =
            if (r.isNullAt(i)) Array.emptyByteArray
            else r.getAs[Array[Byte]](i)
          (bytes(0), bytes(1))
        }
        .saveAsSequenceFile(path)
    }
  }

  private def keyValueColumns(df: DataFrame, op: String): (String, String) = {
    require(df.columns.length >= 2,
      s"SequenceFileSource.$op needs (key, value) as the first two " +
        s"columns; got ${df.columns.length} column(s): " +
        df.columns.mkString("[", ", ", "]"))
    (df.columns(0), df.columns(1))
  }

  /** Returns false when the write should be skipped (Ignore on an
    * existing path); deletes first for Overwrite like the DataFrame
    * writer does.
    */
  private def prepare(spark: SparkSession, mode: SaveMode): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) true
    else mode match {
      case SaveMode.Overwrite => fs.delete(p, true); true
      case SaveMode.Ignore => false
      case SaveMode.Append =>
        throw new UnsupportedOperationException(
          "SequenceFileSource does not append; write a new directory")
      case _ =>
        throw new IllegalStateException(s"path already exists: $path")
    }
  }
}
