package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Dedup

/** Scratch profiler for dedup pipeline stages (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, sf)
    t("warm scan")(docs.selectExpr("md5(text)").write.format("noop").mode("overwrite").save())
    t("shingles")(Dedup.shingles(docs, 3).write.format("noop").mode("overwrite").save())
    val exploded = Dedup.shingles(docs, 3)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
      .withColumn("m", md5(col("sh")))
      .withColumn("h1", conv(substring(col("m"), 1, 8), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("m"), 9, 8), 16, 10).cast("long"))
    val exploded0 = Dedup.shingles(docs, 3)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    println("SHINGLE_ROWS=" + t("explode count")(exploded0.count()))
    t("explode noop")(exploded0.write.format("noop").mode("overwrite").save())
    t("explode+md5 only")(exploded0.withColumn("m", md5(col("sh")))
      .write.format("noop").mode("overwrite").save())
    t("exploded+hash")(exploded.write.format("noop").mode("overwrite").save())
    // HOF-free shingling: posexplode tokens + window lead
    locally {
      import org.apache.spark.sql.expressions.Window
      val toks = docs.select(col("doc_id"),
        posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val sh2 = toks
        .withColumn("sh", concat_ws(" ", col("tok"), lead("tok", 1).over(w), lead("tok", 2).over(w)))
        .withColumn("t2", lead("tok", 2).over(w))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), col("sh")).distinct()
      println("SH2_ROWS=" + t("window-shingles count")(sh2.count()))
      t("window-shingles noop")(sh2.write.format("noop").mode("overwrite").save())
    }
    val mins = (0 until 8).map(i => min(col("h1") + lit(i.toLong) * col("h2")).as(s"s$i"))
    t("sig mins only")(exploded.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .write.format("noop").mode("overwrite").save())
    t("sig mins + collect_set")(exploded.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail :+ collect_set(col("sh")).as("shingles"): _*)
      .write.format("noop").mode("overwrite").save())
    t("full minhashLshPairs")(Dedup.minhashLshPairs(docs, 3, 8, 4, 0.5)
      .write.format("noop").mode("overwrite").save())
    t("full again")(Dedup.minhashLshPairs(docs, 3, 8, 4, 0.5)
      .write.format("noop").mode("overwrite").save())
    t("jaccard ARRAY form")(Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .write.format("noop").mode("overwrite").save())
    t("jaccard INVERTED form")(Dedup.ngramJaccardPairsInverted(docs, 3, 0.5)
      .write.format("noop").mode("overwrite").save())
    t("jaccard ARRAY form 2")(Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .write.format("noop").mode("overwrite").save())
    t("jaccard INVERTED form 2")(Dedup.ngramJaccardPairsInverted(docs, 3, 0.5)
      .write.format("noop").mode("overwrite").save())
    // IVF sanity: probing ALL cells must match brute force exactly
    locally {
      import graft.functions.Similarity
      val emb = Tables.embeddings(spark, sf)
      val q = col("vec_id") % 100 === 0
      val bf = Similarity.bruteForceTopK(emb, q, 10)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfAll = Similarity.ivfTopK(emb, q, 10, 16, 16)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println("IVF_FULLPROBE_RECALL=" + (bf.intersect(ivfAll).size.toDouble / bf.size))
      val ivfSeed = Similarity.ivfTopK(emb, q, 10, 16, 4)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val t0k = System.nanoTime()
      val ivfKm = Similarity.ivfTopK(emb, q, 10, 16, 4, trainIters = 3)
        .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"IVF_SEED_RECALL=${bf.intersect(ivfSeed).size.toDouble / bf.size}%.2f " +
        f"IVF_KMEANS_RECALL=${bf.intersect(ivfKm).size.toDouble / bf.size}%.2f " +
        f"KMEANS_TIME=${(System.nanoTime()-t0k)/1e9}%.1f s")
    }
    spark.stop()
  }
}
