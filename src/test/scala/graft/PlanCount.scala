package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: print exchange counts for spot-audited queries (post-AQE). */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q89_scd2_history", "q86_funnel", "q76_grid_ffill", "q83_token_budget")
    for (q <- qs) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.write.format("noop").mode("overwrite").save() // finalize AQE
      val p = df.queryExecution.executedPlan.toString
      val n = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      val r = p.linesIterator.count(_.contains("ReusedExchange"))
      println(s"$q: $n hash exchanges, $r reused")
      p.linesIterator.filter(l => l.contains("Exchange") || l.contains("Reused"))
        .foreach(l => println("   " + l.trim.take(120)))
    }
    spark.stop()
  }
}
