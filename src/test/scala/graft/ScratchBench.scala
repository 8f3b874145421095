package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: Bench replica that accepts session confs, for A/B of
  * session-level settings. Args: confs(k=v,... or 'none') [reps] [filter] */
object ScratchBench {
  def main(args: Array[String]): Unit = {
    val confs = if (args.length > 0 && args(0).contains('='))
      args(0).split(',').map { kv => val Array(k, v) = kv.split('='); (k, v) }.toSeq
    else Seq.empty
    val reps = if (args.length > 1) args(1).toInt else 2
    val only = args.lift(2).map(_.split(';').toSeq).getOrElse(Seq.empty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    val spark = confs.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet")
      .selectExpr("count(*)", "max(r_name)").collect()
    spark.range(1000).selectExpr("sum(id)").collect()
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.exists(n.contains) }
    var total = 0.0
    val per = selected.map { case (name, fn) =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      total += ts.min
      name -> ts.min
    }
    val qs = per.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    println(f"""SBENCH {"total":"$total%.3f","n":${per.size},"queries":$qs}""")
    spark.stop()
  }
}
