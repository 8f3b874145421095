package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: run queries with per-query job descriptions + event log, so a
  * parser can attribute stage/task time to queries and operators.
  * Args: comma-separated query names (substrings ok), reps (default 2). */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir",
        sys.env.getOrElse("SPARK_GRAFT_EVDIR", "/tmp/spark-events"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.exists(n.contains) }
    selected.foreach { case (name, fn) =>
      val ts = (1 to reps).map { r =>
        spark.sparkContext.setJobDescription(s"$name#rep$r")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      println(f"PROFQ $name best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
