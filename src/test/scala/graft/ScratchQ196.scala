package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: q196 stage profile — users agg, then 1/2/3 chained quints. */
object ScratchQ196 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    import graft.queries.Tables.table
    def users = {
      val maxDay = table(spark, sfDir, "events")
        .agg(max(expr("unix_millis(ts) div 86400000")).as("max_day"))
      table(spark, sfDir, "events")
        .selectExpr("user_id", "unix_millis(ts) div 86400000 as day",
          "cast(value as decimal(18,2)) as v")
        .groupBy("user_id")
        .agg(max("day").as("last_day"), count(lit(1)).as("freq"), sum("v").as("mon"))
        .crossJoin(broadcast(maxDay))
        .withColumn("rec", col("max_day") - col("last_day"))
        .withColumn("seg", lit(0))
    }
    def quint(df: org.apache.spark.sql.DataFrame, v: String, q: String, asc: Boolean) = {
      val in = if (asc) df else df.withColumn("__neg", col(v) * -1)
      val ranked = graft.operators.GlobalRank.withGlobalRank(
        in, "seg", if (asc) v else "__neg", "user_id")
      ranked.withColumn(q, expr("(rn - 1) * 5 div n_seg + 1")).drop("rn", "n_seg", "__neg")
    }
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("users") { users }
    time("quint1") { quint(users, "rec", "r_q", asc = false) }
    time("quint2") { quint(quint(users, "rec", "r_q", asc = false), "freq", "f_q", asc = true) }
    time("quint3") { quint(quint(quint(users, "rec", "r_q", asc = false),
      "freq", "f_q", asc = true), "mon", "m_q", asc = true) }
    println("users rows=" + users.count())
    spark.stop()
  }
}
