package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** POSIX ustar tar reader/writer — the WebDataset container format
  * (multimodal training shards ship as `.tar`/`.tar.gz` of
  * `key.ext` member files). Hand-parsed from the public ustar layout
  * (512-byte header blocks, octal size fields, data padded to the
  * block size), no external libraries — same disposition as
  * [[WarcSource]].
  *
  * Scale shape: shards are read whole (`binaryFile` source) and split
  * in a narrow mapPartitions kernel — one task per shard file, the
  * parallelism WebDataset pipelines are built around (thousands of
  * ~100 MB-1 GB shards). Member bytes never shuffle unless the caller
  * asks for regrouping.
  */
object TarSource {

  final case class TarEntry(file: String, name: String, size: Long,
    bytes: Array[Byte])

  private val BLOCK = 512

  /** Parse one tar (or single-stream .tar.gz, sniffed by magic)
    * byte array into its regular-file entries. Stops at the
    * end-of-archive zero block or the first structurally invalid
    * header (salvage over strictness).
    */
  def parseFile(name: String, bytes: Array[Byte]): Seq[TarEntry] = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F &&
        (bytes(1) & 0xFF) == 0x8B) gunzipAll(bytes)
      else bytes
    val out = Seq.newBuilder[TarEntry]
    var i = 0
    var done = false
    while (!done && i + BLOCK <= data.length) {
      if (isZeroBlock(data, i)) done = true
      else {
        val entryName = cString(data, i, 100)
        val size = octal(data, i + 124, 12)
        val ok = size >= 0 && checksumOk(data, i) &&
          i + BLOCK + size <= data.length
        if (!ok) done = true
        else {
          val typeflag = data(i + 156)
          // '0' and NUL are regular files; everything else (dirs,
          // links, pax extended headers) is skipped but advanced past
          if (typeflag == '0' || typeflag == 0)
            out += TarEntry(name, entryName, size,
              java.util.Arrays.copyOfRange(data, i + BLOCK,
                i + BLOCK + size.toInt))
          val dataBlocks = ((size + BLOCK - 1) / BLOCK).toInt
          i += BLOCK + dataBlocks * BLOCK
        }
      }
    }
    out.result()
  }

  private def isZeroBlock(b: Array[Byte], at: Int): Boolean = {
    var i = at
    while (i < at + BLOCK) { if (b(i) != 0) return false; i += 1 }
    true
  }

  private def cString(b: Array[Byte], at: Int, max: Int): String = {
    var n = 0
    while (n < max && b(at + n) != 0) n += 1
    new String(b, at, n, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Parse an octal field (digits, possibly space/NUL terminated);
    * -1 when nothing parses.
    */
  private def octal(b: Array[Byte], at: Int, len: Int): Long = {
    var i = at
    val end = at + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = -1L
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = (if (v < 0) 0L else v) * 8 + (b(i) - '0')
      i += 1
    }
    v
  }

  /** ustar header checksum: unsigned byte sum with the checksum field
    * itself read as 8 spaces.
    */
  private def checksumOk(b: Array[Byte], at: Int): Boolean = {
    val stored = octal(b, at + 148, 8)
    if (stored < 0) return false
    var sum = 0L
    var i = 0
    while (i < BLOCK) {
      sum += (if (i >= 148 && i < 156) ' '.toLong else (b(at + i) & 0xFF))
      i += 1
    }
    sum == stored
  }

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    try {
      var n = in.read(buf)
      while (n >= 0) {
        if (n > 0) out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch { case _: java.io.IOException => () } // salvage partial
    finally in.close()
    out.toByteArray
  }

  /** Read tar shards into (file, name, size, bytes) — one task per
    * shard file.
    */
  def read(spark: SparkSession, paths: String*): DataFrame = {
    import spark.implicits._
    implicit val enc = org.apache.spark.sql.Encoders.product[TarEntry]
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions(_.flatMap { case (path, bytes) =>
        parseFile(path, bytes)
      })
      .toDF("file", "name", "size", "bytes")
  }

  /** WebDataset sample grouping: members `key.ext` collapse to one
    * row per (file, key) with an ext→bytes map — `0001.jpg` +
    * `0001.json` + `0001.txt` become one training sample. The groupBy
    * key includes the shard file, so grouping never shuffles across
    * shards in practice (samples don't span shards by construction).
    */
  def readGrouped(spark: SparkSession, paths: String*): DataFrame =
    read(spark, paths: _*)
      .withColumn("key",
        regexp_replace(col("name"), "\\.[^./]*$", ""))
      .withColumn("ext",
        regexp_extract(col("name"), "\\.([^./]*)$", 1))
      .groupBy("file", "key")
      .agg(map_from_entries(collect_list(struct(col("ext"),
        col("bytes")))).as("parts"),
        count(lit(1)).as("n_parts"), sum("size").as("n_bytes"))

  /** One ustar entry's bytes: 512-byte header (octal fields, computed
    * checksum) + data padded to the block size. mtime fixed to 0 so
    * shard bytes are deterministic.
    */
  def entryBytes(name: String, data: Array[Byte]): Array[Byte] = {
    require(name.getBytes("ISO-8859-1").length <= 100,
      s"tar member name too long: $name")
    val h = new Array[Byte](BLOCK)
    def put(s: String, at: Int): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      System.arraycopy(b, 0, h, at, b.length)
    }
    put(name, 0)
    put("0000644", 100); put("0000000", 108); put("0000000", 116)
    put(f"${data.length.toLong}%011o", 124)
    put(f"${0L}%011o", 136)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    h(156) = '0'
    put("ustar", 257); h(262) = 0; put("00", 263)
    var sum = 0L
    var i = 0
    while (i < BLOCK) { sum += (h(i) & 0xFF); i += 1 }
    put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '
    val padded = ((data.length + BLOCK - 1) / BLOCK) * BLOCK
    val out = new Array[Byte](BLOCK + padded)
    System.arraycopy(h, 0, out, 0, BLOCK)
    System.arraycopy(data, 0, out, BLOCK, data.length)
    out
  }

  /** A complete archive: entries + the two end-of-archive zero
    * blocks.
    */
  def buildTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    entries.foreach { case (n, d) => out.write(entryBytes(n, d)) }
    out.write(new Array[Byte](2 * BLOCK))
    out.toByteArray
  }

  /** Pack (name, bytes) rows into tar shards of at most `maxBytes`
    * payload per shard, sequentially within each partition (shard key
    * = partitionId-seq). Pure — returns (shard, n_entries, n_bytes,
    * tar) rows; write them wherever the pipeline ships shards
    * ([[writeShardFiles]] for a directory of .tar files).
    */
  def packShards(df: DataFrame, nameCol: String, bytesCol: String,
      maxBytes: Long = 64L << 20): DataFrame = {
    require(maxBytes > 0, "maxBytes must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(nameCol).cast("string"), col(bytesCol))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        new Iterator[(String, Long, Long, Array[Byte])] {
          private var shardSeq = 0
          def hasNext: Boolean = it.hasNext
          def next(): (String, Long, Long, Array[Byte]) = {
            val buf = Seq.newBuilder[(String, Array[Byte])]
            var n = 0L
            var bytes = 0L
            while (it.hasNext && (n == 0 || bytes < maxBytes)) {
              val (name, data) = it.next()
              buf += ((name, data))
              n += 1
              bytes += data.length
            }
            val shard = f"$pid%05d-$shardSeq%04d"
            shardSeq += 1
            (shard, n, bytes, buildTar(buf.result()))
          }
        }
      }
      .toDF("shard", "n_entries", "n_bytes", "tar")
  }

  /** Write packed shards ([[packShards]] output) as `<shard>.tar`
    * files under `dir` via the Hadoop filesystem API; returns the
    * shard count.
    */
  def writeShardFiles(shards: DataFrame, dir: String): Long = {
    val spark = shards.sparkSession
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val n = spark.sparkContext.longAccumulator("tar_shards")
    shards.select(col("shard").cast("string"), col("tar"))
      .as(org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY))
      .foreachPartition { it: Iterator[(String, Array[Byte])] =>
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(confBc.value.value)
        it.foreach { case (shard, tar) =>
          val out = fs.create(
            new org.apache.hadoop.fs.Path(dir, s"$shard.tar"), true)
          try out.write(tar) finally out.close()
          n.add(1)
        }
      }
    n.value
  }
}
