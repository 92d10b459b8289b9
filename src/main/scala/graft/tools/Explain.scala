package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph._
import graft.ingest._

/** Dumps the physical plans of the hot-path superstep so the shuffle
  * structure can be audited: the per-superstep gather join must not
  * re-exchange the persisted adjacency, and the apply join must reuse
  * the vid hash partitioning from the previous superstep's
  * localCheckpoint. Usage: ./run_main.sh graft.tools.Explain
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
    // same as Engine.run
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")

    val corpus = RepoCorpus.generate(spark, RepoCorpus.Config(nRepos = 3000, filesPerRepo = 3))
    val (edges, _) = EdgeExtraction.ingest(EdgeExtraction.withSha(corpus))
    val adj = Adjacency.build(edges, parts = 8)
    adj.out.count() // materialize the cache so plans below scan it

    // Simulate the state AS THE ENGINE SEES IT on superstep >= 2: the
    // localCheckpoint of the previous apply join's output (partitioned
    // by vid if localCheckpoint preserves outputPartitioning).
    val init = adj.vertices.select(col("vid"), lit(0.15).as("rank"),
      lit(1L).as("degree"), lit(true).as("changed")).localCheckpoint(true)

    def superstep(state: DataFrame, repartitionMsgs: Boolean): DataFrame = {
      val msgs0 = state.select(col("vid"), (col("rank") / col("degree")).as("msg"))
      val msgs = if (repartitionMsgs) msgs0.repartition(8, col("vid")) else msgs0
      val gathered = adj.out
        .join(msgs, adj.out("src") === msgs("vid"), "inner")
        .select(col("msg"), explode(col("nbrs")).as("e"))
        .select(col("e.dst").as("vid"), (col("msg") * col("e.w")).as("mv"))
        .groupBy(col("vid")).agg(sum(col("mv")).as("y"))
      state.join(gathered, Seq("vid"), "left_outer")
        .select(col("vid"), col("degree"), lit(true).as("changed"),
          (lit(0.15) + lit(0.85) * coalesce(col("y"), lit(0.0))).as("rank"))
    }

    def audit(name: String, df: DataFrame): DataFrame = {
      val plan = df.queryExecution.executedPlan
      val s = plan.toString
      val nEx = "(?m)^\\s*[+:]?[- ]*Exchange hashpartitioning".r.findAllIn(s).length
      println(s"===== $name: $nEx hash exchanges =====")
      println(s.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("HashAggregate") ||
          l.contains("InMemoryTableScan") || l.contains("Scan ExistingRDD"))
        .map(_.take(140)).mkString("\n"))
      df
    }

    val s1 = audit("superstep 1 (with explicit repartition)",
      superstep(init, repartitionMsgs = true)).localCheckpoint(true)
    audit("superstep 2 (with explicit repartition)", superstep(s1, repartitionMsgs = true))
    audit("superstep 2 (NO explicit repartition)", superstep(s1, repartitionMsgs = false))
    val s2 = superstep(s1, repartitionMsgs = false).localCheckpoint(true)
    audit("superstep 3 (NO explicit repartition)", superstep(s2, repartitionMsgs = false))
    spark.stop()
  }
}
