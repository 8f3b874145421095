package graft.sources.bi5

import java.io.InputStream

/**
 * Filesystem seam of the bi5 source. The reference walks the local
 * filesystem with `Files.walk` (reference BI5DataSource.scala:103-109) —
 * faithful for local/NFS trees, but a 100 TB tick archive lives on
 * S3/HDFS/GCS. Every listing/open in the source goes through this trait:
 *
 *  - bare paths (`/data/ticks`) use [[NioBi5Store]] — java.nio, identical
 *    behavior (and performance) to the reference's local contract;
 *  - URI paths (`file://`, `hdfs://`, `s3a://`, …) use [[HadoopBi5Store]] —
 *    Hadoop `FileSystem`, resolved per scheme from the session's Hadoop
 *    configuration, which carries credentials/endpoints the user set in
 *    `spark.hadoop.*`.
 *
 * Instances are created DRIVER-side (where the active session's Hadoop conf
 * is in scope) and serialized into partition reader factories, so executors
 * open files through the same store — the conf rides along via
 * [[SerializableHadoopConf]].
 */
trait Bi5Store extends Serializable {

  def exists(path: String): Boolean

  def isDirectory(path: String): Boolean

  /** Immediate children of a directory (files and dirs), unsorted. */
  def children(path: String): Seq[Bi5Store.Entry]

  /** All regular `.bi5` files under root recursively, (path, size); the root
    * itself when it is a plain `.bi5` file. Best-effort: traversal faults
    * yield what was accumulated (skip-corrupt extends to listing). */
  def listBi5Files(root: String): Seq[(String, Long)]

  def open(path: String): InputStream

  def fileSize(path: String): Long
}

object Bi5Store {

  final case class Entry(path: String, isDir: Boolean, size: Long)

  private val SchemePrefix = "^[a-zA-Z][a-zA-Z0-9+.\\-]*://".r

  /** Route a load path to its store. Driver-side only (touches the active
    * session for the Hadoop conf); the returned store is serializable. */
  def forPath(path: String): Bi5Store =
    if (SchemePrefix.findPrefixOf(path).isDefined)
      new HadoopBi5Store(new SerializableHadoopConf(activeHadoopConf()))
    else NioBi5Store

  private def activeHadoopConf(): org.apache.hadoop.conf.Configuration =
    try org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    catch { case _: Throwable => new org.apache.hadoop.conf.Configuration() }
}

/** Local-filesystem store: the reference's java.nio contract, verbatim. */
object NioBi5Store extends Bi5Store {

  import java.nio.file.{Files, Paths}

  override def exists(path: String): Boolean = Files.exists(Paths.get(path))

  override def isDirectory(path: String): Boolean = Files.isDirectory(Paths.get(path))

  override def children(path: String): Seq[Bi5Store.Entry] = {
    val s =
      try Files.list(Paths.get(path))
      catch { case scala.util.control.NonFatal(_) => return Seq.empty }
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map { p =>
        val dir = Files.isDirectory(p)
        Bi5Store.Entry(
          p.toString, dir,
          if (dir) 0L else (try Files.size(p) catch { case _: Throwable => 0L }))
      }.toVector
    } finally s.close()
  }

  override def listBi5Files(root: String): Seq[(String, Long)] =
    Bi5FileLister.listBi5Files(Paths.get(root))

  override def open(path: String): InputStream = new java.io.FileInputStream(path)

  override def fileSize(path: String): Long = new java.io.File(path).length()
}

/**
 * Hadoop-FileSystem store: one class serves every scheme Hadoop can mount
 * (file, hdfs, s3a, gs, abfs, …). `FileSystem.get` caches per (scheme,
 * authority, ugi), so per-call resolution is a map lookup.
 *
 * The recursive listing uses `FileSystem.listFiles(recursive = true)`, which
 * object stores implement as flat paged LIST calls — O(files / page) round
 * trips instead of one RPC per directory, the difference between minutes and
 * hours on a million-object bucket.
 */
class HadoopBi5Store(conf: SerializableHadoopConf) extends Bi5Store {

  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf.value)

  override def exists(path: String): Boolean = {
    val p = new HPath(path)
    try fsOf(p).exists(p)
    catch { case scala.util.control.NonFatal(_) => false }
  }

  override def isDirectory(path: String): Boolean = {
    val p = new HPath(path)
    try fsOf(p).getFileStatus(p).isDirectory
    catch { case scala.util.control.NonFatal(_) => false }
  }

  override def children(path: String): Seq[Bi5Store.Entry] = {
    val p = new HPath(path)
    try fsOf(p).listStatus(p).toSeq.map { st =>
      Bi5Store.Entry(st.getPath.toString, st.isDirectory, if (st.isDirectory) 0L else st.getLen)
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }

  override def listBi5Files(root: String): Seq[(String, Long)] = {
    val p = new HPath(root)
    val out = Vector.newBuilder[(String, Long)]
    try {
      val fs = fsOf(p)
      val st = fs.getFileStatus(p) // throws FileNotFoundException -> empty
      if (!st.isDirectory) {
        if (st.getPath.toString.toLowerCase.endsWith(".bi5")) out += ((st.getPath.toString, st.getLen))
      } else {
        val it = fs.listFiles(p, true)
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getPath.toString.toLowerCase.endsWith(".bi5")) {
            out += ((f.getPath.toString, f.getLen))
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => } // partial listing on fault
    out.result()
  }

  override def open(path: String): InputStream = {
    val p = new HPath(path)
    fsOf(p).open(p)
  }

  override def fileSize(path: String): Long = {
    val p = new HPath(path)
    try fsOf(p).getFileStatus(p).getLen
    catch { case scala.util.control.NonFatal(_) => 0L }
  }
}

/** Java-serializable Hadoop `Configuration` (the standard write/readFields
  * envelope), so executor-side readers see the driver's `spark.hadoop.*`
  * settings — S3 credentials, endpoints, timeouts. */
class SerializableHadoopConf(@transient private var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {

  def value: org.apache.hadoop.conf.Configuration = conf

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}
