package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch timer (not shipped in main): times one query with a
  * conf toggled, best-of-N, noop sink. Args: queryName conf=value[,c=v...] reps */
object ScratchTimer {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val confs = if (args.length > 1 && args(1).contains('='))
      args(1).split(',').map { kv => val Array(k, v) = kv.split('='); (k, v) }.toSeq
    else Seq.empty
    val reps = if (args.length > 2) args(2).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = confs.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    val fn = SparkEntry.queries(name)
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"SCRATCH $name confs=${confs.mkString(";")} best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
