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

  /**
   * All regular `.bi5` files under root recursively, (path, size); the root
   * itself when it is a plain `.bi5` file. STRICT — used by driver-side
   * planning and listing. Fault contract differs by store:
   * [[NioBi5Store]] returns the partial accumulation on any traversal fault
   * (the reference's local skip-corrupt contract — a dir deleted mid-walk is
   * retention, not an error); [[HadoopBi5Store]] tolerates only
   * FileNotFound (deleted-while-listing) and PROPAGATES transient faults
   * (throttling, auth, network), because silently truncating an object-store
   * listing turns a retryable RPC failure into missing data.
   */
  def listBi5Files(root: String): Seq[(String, Long)]

  /** LAZY recursive walk for the executor read path: files stream out as
    * the traversal advances (no subtree-sized materialization, first row
    * decodes before the listing completes). The caller owns [[Bi5Store.FileWalk.close]]. */
  def walkBi5Files(root: String): Bi5Store.FileWalk

  def open(path: String): InputStream

  def fileSize(path: String): Long
}

object Bi5Store {

  final case class Entry(path: String, isDir: Boolean, size: Long)

  /** A lazy file traversal plus the handle to release its resources. */
  trait FileWalk extends AutoCloseable {
    def files: Iterator[String]
    override def close(): Unit
  }

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

  override def listBi5Files(root: String): Seq[(String, Long)] = {
    val p = Paths.get(root)
    if (!Files.exists(p)) return Seq.empty
    val out = Vector.newBuilder[(String, Long)]
    val stream =
      try Files.walk(p, java.nio.file.FileVisitOption.FOLLOW_LINKS)
      catch { case scala.util.control.NonFatal(_) => return Seq.empty }
    try {
      val it = stream.iterator()
      // manual loop so a mid-walk fault (dir deleted by retention, symlink
      // loop, permission change) yields the partial accumulation — the
      // reference's local skip-corrupt contract extends to traversal
      while (it.hasNext) {
        val f = it.next()
        if (f.toString.toLowerCase.endsWith(".bi5") && Files.isRegularFile(f)) {
          out += ((f.toString, try Files.size(f) catch { case _: Throwable => 0L }))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => } // partial listing
    finally stream.close()
    out.result()
  }

  override def walkBi5Files(root: String): Bi5Store.FileWalk = new Bi5Store.FileWalk {
    private val p = Paths.get(root)
    private var stream: java.util.stream.Stream[java.nio.file.Path] = _
    override val files: Iterator[String] =
      if (!Files.exists(p)) Iterator.empty
      else {
        stream = Files.walk(p, java.nio.file.FileVisitOption.FOLLOW_LINKS)
        val it = stream.iterator()
        // a traversal fault (dir deleted mid-walk, unreadable dir, symlink
        // loop) ends this supply instead of failing the task — the local
        // skip-corrupt contract; only NonFatal, an OOM/interrupt must kill
        new Iterator[String] {
          override def hasNext: Boolean =
            try it.hasNext catch { case scala.util.control.NonFatal(_) => false }
          override def next(): String = it.next().toString
        }.filter(_.toLowerCase.endsWith(".bi5"))
      }
    override def close(): Unit =
      if (stream != null) { try stream.close() catch { case _: Throwable => } }
  }

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

  import java.io.FileNotFoundException

  import org.apache.hadoop.fs.{FileSystem, Path => HPath}

  private def fsOf(p: HPath): FileSystem = p.getFileSystem(conf.value)

  // Fault contract (deliberately NOT the nio store's swallow-everything):
  // FileNotFound means the path/subtree vanished — tolerated, it's retention
  // or a bad user path. Anything else (credential, throttling, network) is a
  // REAL error and propagates: a load() over s3a with broken credentials
  // must say so, not report "Invalid path", and a transient LIST failure
  // must fail the (retryable) job, not silently shrink its input.

  override def exists(path: String): Boolean = {
    val p = new HPath(path)
    fsOf(p).exists(p) // internally FNF -> false; other faults propagate
  }

  override def isDirectory(path: String): Boolean = {
    val p = new HPath(path)
    try fsOf(p).getFileStatus(p).isDirectory
    catch { case _: FileNotFoundException => false }
  }

  override def children(path: String): Seq[Bi5Store.Entry] = {
    val p = new HPath(path)
    try fsOf(p).listStatus(p).toSeq.map { st =>
      Bi5Store.Entry(st.getPath.toString, st.isDirectory, if (st.isDirectory) 0L else st.getLen)
    } catch { case _: FileNotFoundException => Seq.empty }
  }

  override def listBi5Files(root: String): Seq[(String, Long)] = {
    val p = new HPath(root)
    val out = Vector.newBuilder[(String, Long)]
    try {
      val fs = fsOf(p)
      val st = fs.getFileStatus(p) // FileNotFoundException -> empty
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
    } catch { case _: FileNotFoundException => } // subtree deleted mid-listing: partial
    out.result()
  }

  override def walkBi5Files(root: String): Bi5Store.FileWalk = new Bi5Store.FileWalk {
    // listFiles(recursive) pages lazily (RemoteIterator); nothing to close
    override val files: Iterator[String] = {
      val p = new HPath(root)
      try {
        val fs = fsOf(p)
        val st = fs.getFileStatus(p)
        if (!st.isDirectory) {
          if (st.getPath.toString.toLowerCase.endsWith(".bi5")) Iterator.single(st.getPath.toString)
          else Iterator.empty
        } else {
          val it = fs.listFiles(p, true)
          new Iterator[String] {
            // FNF mid-paging = subtree deleted: supply ends. Transient RPC
            // faults propagate — the task fails and Spark retries it, which
            // beats silently truncating an object-store read
            override def hasNext: Boolean =
              try it.hasNext catch { case _: FileNotFoundException => false }
            override def next(): String = it.next().getPath.toString
          }.filter(_.toLowerCase.endsWith(".bi5"))
        }
      } catch { case _: FileNotFoundException => Iterator.empty }
    }
    override def close(): Unit = ()
  }

  override def open(path: String): InputStream = {
    val p = new HPath(path)
    fsOf(p).open(p)
  }

  override def fileSize(path: String): Long = {
    val p = new HPath(path)
    try fsOf(p).getFileStatus(p).getLen
    catch { case _: FileNotFoundException => 0L }
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
