package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6 plan-evidence dumper (separate main — Bench/Verify frozen):
  * prints the REAL inner physical plans that the result-frame
  * `.explain("formatted")` dumps in plans/r06 cannot show, because the
  * loops materialize state before the declared query's final frame:
  *
  *  - the engine superstep plan of q_pagerank_top's loop (via the
  *    Engine's GRAFT_EXPLAIN_SUPERSTEP hook — set it to an iteration
  *    number before launching this main);
  *  - TriangleCount's internal aggregation plan (the node-iterator
  *    form), whose count() runs inside the query closure.
  *
  * Usage: GRAFT_EXPLAIN_SUPERSTEP=2 runMain graft.tools.ExplainR06
  * (stderr carries the [engine-plan] superstep dump).
  */
object ExplainR06 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-explain-r06")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = spark.read.parquet(s"$sfDir/lineitem.parquet").select(
      (col("l_orderkey") % 1000).as("src"),
      (col("l_partkey") % 1000).as("dst"))

    // --- TriangleCount internals: orient + the intersect aggregation
    val o = graft.algos.TriangleCount.orient(edges)
      .repartition(cpus, col("src")).persist()
    o.count()
    val adjl = o.groupBy(col("src").as("vid"))
      .agg(sort_array(collect_list(col("dst"))).as("ns"))
    val withLists = o
      .join(adjl.select(col("vid").as("src"), col("ns").as("ns_u")), "src")
      .join(adjl.select(col("vid").as("dst"), col("ns").as("ns_v")), "dst")
      .agg(coalesce(sum(size(array_intersect(col("ns_u"), col("ns_v"))).cast("long")),
        lit(0L)))
    println("===== q_triangles inner aggregation (node-iterator form) =====")
    withLists.explain("formatted")
    o.unpersist()

    // --- the real engine superstep plan: run the q_pagerank_top loop
    // with the GRAFT_EXPLAIN_SUPERSTEP hook armed (prints [engine-plan]
    // on stderr from inside Engine.runLoop)
    val adj = graft.graph.Adjacency.build(edges, parts = 7)
    graft.algos.PageRank.run(adj, maxIters = 5)
    spark.stop()
  }
}
