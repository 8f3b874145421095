package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage profile of q135's pipeline (noop sinks). */
object ScratchQ135 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    graft.queries.Tables.table(spark, sfDir, "documents").count()

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label best=${ts.min}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val sparkShingles =
      "word_ngrams(toks, 3)"
    def tf = graft.queries.Tables.table(spark, sfDir, "documents")
      .withColumn("toks", expr("tokenize_text(text)"))
      .filter(size(col("toks")) >= 3)
      .selectExpr("doc_id", s"$sparkShingles as shs")
      .select(col("doc_id"), explode(col("shs")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    def dfc = tf.groupBy("tok").agg(count(lit(1)).as("df")).filter(col("df") <= 20)
    def nd = graft.queries.Tables.table(spark, sfDir, "documents").agg(count(lit(1)).as("nd"))
    def w = tf.join(dfc, Seq("tok")).crossJoin(broadcast(nd))
      .withColumn("w", expr("cast(tf as double) * ln(cast(nd as double) / cast(df as double))"))

    time("tf") { tf.write.format("noop").mode("overwrite").save() }
    time("dfc") { dfc.write.format("noop").mode("overwrite").save() }
    time("w") { w.write.format("noop").mode("overwrite").save() }
    time("n2") {
      w.groupBy("doc_id")
        .agg(sum(expr("cast(round(w * w, 12) as decimal(28,12))")).as("n2"))
        .write.format("noop").mode("overwrite").save()
    }
    time("dots") {
      w.select(col("tok"), col("doc_id").as("ida"), col("w").as("wa"))
        .join(w.select(col("tok"), col("doc_id").as("idb"), col("w").as("wb")), Seq("tok"))
        .filter(col("ida") =!= col("idb"))
        .groupBy("ida", "idb")
        .agg(sum(expr("cast(round(wa * wb, 12) as decimal(28,12))")).as("dot"))
        .write.format("noop").mode("overwrite").save()
    }
    time("full") {
      SparkEntry.queries("q135_tfidf_neighbors")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // row counts for context
    println("tf rows=" + tf.count())
    println("w rows=" + w.count())
    val pairRows = w.select(col("tok"), col("doc_id").as("ida"), col("w").as("wa"))
      .join(w.select(col("tok"), col("doc_id").as("idb"), col("w").as("wb")), Seq("tok"))
      .filter(col("ida") =!= col("idb")).count()
    println("pair rows=" + pairRows)
    spark.stop()
  }
}
// variants appended for matched timing
object ScratchQ135B {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/region.parquet").selectExpr("count(*)").collect()
    graft.queries.Tables.table(spark, sfDir, "documents").count()
    val sparkShingles =
      "word_ngrams(toks, 3)"
    def q135(variant: String): org.apache.spark.sql.DataFrame = {
      val base0 = graft.queries.Tables.table(spark, sfDir, "documents")
      val base = if (variant.contains("spread"))
        graft.queries.Tables.spreadSmall(spark, sfDir, "documents", base0) else base0
      var tf = base
        .withColumn("toks", expr("tokenize_text(text)"))
        .filter(size(col("toks")) >= 3)
        .selectExpr("doc_id", s"$sparkShingles as shs")
        .select(col("doc_id"), explode(col("shs")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      if (variant.contains("ckpt")) tf = tf.localCheckpoint(true)
      val dfc = tf.groupBy("tok").agg(count(lit(1)).as("df")).filter(col("df") <= 20)
      val nd = graft.queries.Tables.table(spark, sfDir, "documents").agg(count(lit(1)).as("nd"))
      val w = tf.join(dfc, Seq("tok")).crossJoin(broadcast(nd))
        .withColumn("w", expr("cast(tf as double) * ln(cast(nd as double) / cast(df as double))"))
      val n2 = w.groupBy("doc_id")
        .agg(sum(expr("cast(round(w * w, 12) as decimal(28,12))")).as("n2"))
      val dots = w.select(col("tok"), col("doc_id").as("ida"), col("w").as("wa"))
        .join(w.select(col("tok"), col("doc_id").as("idb"), col("w").as("wb")), Seq("tok"))
        .filter(col("ida") =!= col("idb"))
        .groupBy("ida", "idb")
        .agg(sum(expr("cast(round(wa * wb, 12) as decimal(28,12))")).as("dot"))
      dots
        .join(n2.select(col("doc_id").as("ida"), col("n2").as("n2a")), Seq("ida"))
        .join(n2.select(col("doc_id").as("idb"), col("n2").as("n2b")), Seq("idb"))
        .withColumn("cos", expr(
          "cast(dot as double) / (sqrt(cast(n2a as double)) * sqrt(cast(n2b as double)))"))
        .withColumn("rank",
          expr("row_number() over (partition by ida order by cos desc, idb asc)"))
        .filter(col("rank") <= 3)
        .selectExpr("ida", "rank", "idb", "round(cos, 6) as cos")
        .orderBy("ida", "rank")
    }
    for (v <- Seq("plain", "spread", "ckpt", "spread+ckpt", "plain", "spread", "ckpt", "spread+ckpt")) {
      val t0 = System.nanoTime()
      q135(v).write.format("noop").mode("overwrite").save()
      println(f"VAR $v ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
