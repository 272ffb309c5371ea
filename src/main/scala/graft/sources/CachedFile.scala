package graft.sources

import java.io.File
import java.net.URI
import org.apache.spark.SparkFiles
import org.apache.spark.sql.SparkSession

/** Ship a lookup file to every task with a stable local name — the
  * reference's `DistributedCacheFile` contract
  * (filecache/DistributedCacheFile.scala:36-151): register at
  * configuration time, get back a small Serializable handle whose
  * `.path`/`.file` resolve node-locally inside closures, with a
  * collision-proof name (same basename from two directories must not
  * clash across a cluster-wide cache).
  *
  * Spark-first rebuild: Hadoop's DistributedCache + symlink becomes
  * `SparkContext.addFile` + `SparkFiles.get`. Spark registers shipped
  * files by BASENAME, so the reference's uniqueness trick is applied
  * up front: the source is staged under `<fileName>-<urihash>` (a
  * driver-side symlink for local files, a one-time copy for remote
  * URIs — cached lookup files are small by contract) and THAT name is
  * what tasks resolve. Registration is idempotent per URI (the hash
  * makes equal names mean equal sources, which `addFile` tolerates).
  *
  * {{{
  * val stop = DistributedCacheFile("/data/stopwords.txt")(spark)
  * ds.map { x => readLines(stop.file) ... }   // runs on executors
  * }}}
  */
object DistributedCacheFile {

  def apply(path: String)(implicit spark: SparkSession): CachedFile =
    UncachedFile(path).add()

  def apply(uri: URI)(implicit spark: SparkSession): CachedFile =
    UncachedFile(uri.toString).add()

  /** `<fileName>-<32-hex-char uri hash>` — same shape as the
    * reference's `symlinkNameFor` (DistributedCacheFile.scala:75-80);
    * the hash is two seeded 64-bit string hashes over the qualified
    * URI, zero-padded, which keeps the name stable across sessions
    * and unique per source path.
    */
  def symlinkNameFor(uri: URI): String = {
    val s = uri.toASCIIString
    def h64(seed: Long): Long = {
      // FNV-1a over the UTF-8 bytes, seed-perturbed — deterministic
      // across JVMs (String.hashCode would be too, but 32 bits is
      // thin for cluster-wide uniqueness)
      var h = 0xcbf29ce484222325L ^ seed
      s.getBytes("UTF-8").foreach { b =>
        h ^= (b & 0xffL); h *= 0x100000001b3L
      }
      h
    }
    val hex = f"${h64(1L)}%016x${h64(2L)}%016x"
    s"${new File(uri.getPath).getName}-$hex"
  }
}

final case class UncachedFile(source: String) {

  /** Register with the session and return the Serializable handle
    * (reference `UncachedFile.add()`).
    */
  def add()(implicit spark: SparkSession): CachedFile = {
    val sc = spark.sparkContext
    val hadoopPath = new org.apache.hadoop.fs.Path(source)
    val fs = hadoopPath.getFileSystem(sc.hadoopConfiguration)
    val qualified = fs.makeQualified(hadoopPath).toUri
    require(fs.exists(hadoopPath), s"cached file does not exist: $source")
    val name = DistributedCacheFile.symlinkNameFor(qualified)
    val staged = new File(stageDir(sc), name)
    if (!staged.exists()) {
      // a real copy, not a symlink: SparkContext.addFile canonicalizes
      // links, which would register the file under its ORIGINAL
      // basename and re-introduce the collision this name prevents
      fs.copyToLocalFile(hadoopPath,
        new org.apache.hadoop.fs.Path(staged.getAbsolutePath))
    }
    sc.addFile(staged.getAbsolutePath)
    CachedFile(name, qualified.toString)
  }

  private def stageDir(sc: org.apache.spark.SparkContext): File = {
    val d = new File(
      System.getProperty("java.io.tmpdir"),
      s"graft-filecache-${sc.applicationId}")
    d.mkdirs()
    d
  }
}

/** Serializable handle to a shipped file — capture it in a `val` at
  * job-build time, call `.path`/`.file` inside closures (reference
  * `CachedFile`, DistributedCacheFile.scala:132-151). Resolution goes
  * through `SparkFiles.get`, which returns the task-local copy on
  * executors and the staged copy on the driver.
  */
final case class CachedFile(name: String, sourceUri: String) {
  def path: String = SparkFiles.get(name)
  def file: File = new File(path)
}
