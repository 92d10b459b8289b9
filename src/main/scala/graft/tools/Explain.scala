package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph._
import graft.ingest._

/** Dumps the physical plans of the hot-path operators so the shuffle
  * structure can be audited: the per-superstep gather join must not
  * re-exchange the persisted adjacency, and the apply join must reuse
  * the vid hash partitioning. Usage: sbt "runMain graft.tools.Explain"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false") // stable plans for reading
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = RepoCorpus.generate(spark, RepoCorpus.Config(nRepos = 3000, filesPerRepo = 3))
    val (edges, _) = EdgeExtraction.ingest(EdgeExtraction.withSha(corpus))
    val adj = Adjacency.build(edges, parts = 8)

    val state = adj.vertices.select(col("vid"), lit(0.15).as("rank"),
      lit(1L).as("degree"), lit(true).as("changed")).localCheckpoint(true)

    def gatherPlan(broadcastMsgs: Boolean): Unit = {
      val msgs0 = state.select(col("vid"), (col("rank") / col("degree")).as("msg"))
      val msgs = if (broadcastMsgs) broadcast(msgs0)
                 else msgs0.repartition(8, col("vid"))
      val gathered = adj.out
        .join(msgs, adj.out("src") === msgs("vid"), "inner")
        .select(col("msg"), explode(col("nbrs")).as("e"))
        .select(col("e.dst").as("vid"), (col("msg") * col("e.w")).as("mv"))
        .groupBy(col("vid")).agg(sum(col("mv")).as("y"))
      val applied = state.join(gathered, Seq("vid"), "left_outer")
        .select(col("vid"), (lit(0.15) + lit(0.85) * coalesce(col("y"), lit(0.0))).as("rank"))
      println(s"===== superstep plan (broadcast=$broadcastMsgs) =====")
      applied.explain("formatted")
    }

    gatherPlan(broadcastMsgs = true)
    gatherPlan(broadcastMsgs = false)
    spark.stop()
  }
}
