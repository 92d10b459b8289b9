package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ingest._

/** Synthesize the repo corpus, extract link edges, park them as
  * parquet — the reusable input for scaling benchmarks.
  * Usage: ./run_main.sh graft.tools.ParkEdges <nRepos> <outPath>
  */
object ParkEdges {
  def main(args: Array[String]): Unit = {
    val nRepos = args(0).toLong
    val out = args(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-park-edges")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val corpus = RepoCorpus.generate(spark, RepoCorpus.Config(nRepos = nRepos, filesPerRepo = 4))
    val (edges, _) = EdgeExtraction.ingest(EdgeExtraction.withSha(corpus))
    edges.write.mode("overwrite").parquet(out)
    val n = spark.read.parquet(out).count()
    println(f"[park] repos=$nRepos edges=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f -> $out")
    spark.stop()
  }
}
