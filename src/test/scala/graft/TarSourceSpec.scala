package graft

import org.apache.spark.sql.functions._
import graft.sources.TarSource

class TarSourceSpec extends SparkSpec {

  /** A real GNU-tar-produced ustar fixture (`tar --format=ustar`,
    * gzipped): 000001.txt "hello tar", 000001.json "{"k":1}",
    * 000002.txt "second" — proves interop with archives this code
    * did not write.
    */
  private val gnuTarGzB64 =
    "H4sICDmGgGoAA2ZpeC50YXIA7dXRCoIwFMZxH0V8ANmZc0JvEylEiQM1CKJ3b9pFYGAXMUf0" +
    "/90MtotzdtjHlPIkH69jEsxUwhozr95y9fUlkVJ0WRTGTPuiC62TVIVr6eUyjPvet9I7tzqC" +
    "T+fLy/2IY9O2Lp1GgH/0zF9+GlwXtMZq/lW1zL+xQv63cMvO2U7usdtAJPNj1ZH/f2Xf//+K" +
    "/G9haA6uq2N3AQAAAAAAAAAAAAD41gMEYcqTACgAAA=="

  test("parseFile reads a real GNU-tar archive (gzipped), interop proven") {
    val bytes = java.util.Base64.getDecoder.decode(gnuTarGzB64)
    val entries = TarSource.parseFile("fix.tar.gz", bytes)
    assert(entries.map(_.name) ==
      Seq("000001.txt", "000001.json", "000002.txt"))
    assert(new String(entries(0).bytes, "UTF-8") == "hello tar")
    assert(new String(entries(1).bytes, "UTF-8") == """{"k":1}""")
    assert(new String(entries(2).bytes, "UTF-8") == "second")
    assert(entries.forall(e => e.size == e.bytes.length))
  }

  test("round trip: buildTar output parses back exactly; GNU fixture re-packs") {
    val in = Seq(
      "a/0001.jpg" -> Array.tabulate(700)(i => (i % 251).toByte),
      "a/0001.txt" -> "caption one".getBytes("UTF-8"),
      "empty.bin" -> Array.empty[Byte])
    val tar = TarSource.buildTar(in)
    // blocked layout: header+ceil(size/512) blocks per entry + 2 EOA
    assert(tar.length == (512 + 1024) + (512 + 512) + 512 + 1024)
    val back = TarSource.parseFile("t", tar)
    assert(back.map(_.name) == in.map(_._1))
    in.zip(back).foreach { case ((_, d), e) =>
      assert(java.util.Arrays.equals(d, e.bytes))
    }
    // our writer's entries parse under the same checksum rule that
    // accepted the GNU fixture; corrupting one checksum byte rejects
    val bad = tar.clone()
    bad(148) = '9'
    assert(TarSource.parseFile("t", bad).isEmpty)
  }

  test("read + readGrouped: WebDataset sample grouping over shard files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tarsrc").toString
    val shard1 = TarSource.buildTar(Seq(
      "0001.img" -> "IMG1".getBytes("UTF-8"),
      "0001.json" -> """{"label":1}""".getBytes("UTF-8"),
      "0002.img" -> "IMG2".getBytes("UTF-8"),
      "0002.json" -> """{"label":2}""".getBytes("UTF-8")))
    val shard2 = TarSource.buildTar(Seq(
      "0003.img" -> "IMG3".getBytes("UTF-8")))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "s1.tar"), shard1)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "s2.tar"), shard2)

    val flat = TarSource.read(spark, dir)
    assert(flat.count() == 5)
    val grouped = TarSource.readGrouped(spark, dir)
      .collect().map(r => r.getAs[String]("key") ->
        ((r.getAs[Long]("n_parts"),
          r.getAs[Map[String, Array[Byte]]]("parts")))).toMap
    assert(grouped.keySet == Set("0001", "0002", "0003"))
    assert(grouped("0001")._1 == 2L)
    assert(new String(grouped("0001")._2("json"), "UTF-8") ==
      """{"label":1}""")
    assert(new String(grouped("0003")._2("img"), "UTF-8") == "IMG3")
  }

  test("packShards + writeShardFiles: size-capped shards, files round-trip") {
    import spark.implicits._
    val rows = (1 to 40)
      .map(i => (f"doc$i%04d.txt", ("x" * 400 + i).getBytes("UTF-8")))
      .toDF("name", "bytes").repartition(2)
    // ~400B payloads, 1000B cap -> 2-3 entries per shard
    val shards = TarSource.packShards(rows, "name", "bytes",
      maxBytes = 1000L)
    val stats = shards.select("shard", "n_entries", "n_bytes").collect()
    assert(stats.map(_.getLong(1)).sum == 40L)
    // every shard but possibly each partition's last respects the cap
    // loosely (cap checked BEFORE adding, so <= cap + one entry)
    assert(stats.forall(_.getLong(2) <= 1000L + 500L))
    val dir = java.nio.file.Files.createTempDirectory("tarshards").toString
    val n = TarSource.writeShardFiles(shards, dir)
    assert(n == stats.length.toLong)
    val back = TarSource.read(spark, dir)
    assert(back.count() == 40)
    assert(back.agg(sum(length(col("bytes")))).head().getLong(0) ==
      rows.agg(sum(length(col("bytes")))).head().getLong(0))
  }
}
