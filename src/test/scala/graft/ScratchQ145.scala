package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: q145 stage profile. */
object ScratchQ145 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    import graft.queries.Tables.table
    def toks = table(spark, sfDir, "documents")
      .select(col("doc_id"), posexplode(expr("tokenize_text(text)")).as(Seq("pos", "tok")))
    def lens = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    def stats = lens.agg(count(lit(1)).as("nd"), sum("dl").as("tt"))
    def qterms = toks.groupBy("tok").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(3).select("tok")
    def tfs = toks.join(broadcast(qterms), Seq("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), min("pos").as("minpos"))
      .withColumn("rel", when(col("minpos") <= 19, 1L).otherwise(0L))
    def dfs = tfs.groupBy("tok").agg(count(lit(1)).as("df"))
    def scored = tfs
      .join(lens, Seq("doc_id"))
      .join(broadcast(dfs), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("sterm", expr(
        """ln(1.0d + (cast(nd - df as double) + 0.5d) / (cast(df as double) + 0.5d))
           * ((cast(tf as double) * 2.2d)
              / (cast(tf as double)
                 + 1.2 * (0.25d + 0.75d * (cast(dl as double)
                                           / (cast(tt as double) / cast(nd as double))))))"""))
    def top = scored.select(col("tok"), col("doc_id"), col("sterm"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.operators.TopKByValue(10).toColumn.name("top"))
      .flatMap { case (tok, hits) =>
        hits.iterator.zipWithIndex.map { case ((id, _), i) => (tok, i + 1, id) }
      }
      .toDF("tok", "rank", "doc_id")
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    time("toks") { toks }
    time("qterms") { qterms }
    time("tfs") { tfs }
    time("scored") { scored }
    time("top") { top }
    time("full") { SparkEntry.queries("q145_retrieval_eval")(spark, sfDir) }
    println("scored rows=" + scored.count())
    spark.stop()
  }
}
