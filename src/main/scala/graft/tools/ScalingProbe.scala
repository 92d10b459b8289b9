package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ingest._
import graft.graph._
import graft.algos._

/** Per-iteration breakdown of the PageRank superstep loop at one
  * parallelism level — the profiling companion to Bench's scaling
  * phase. Usage: ./run_main.sh graft.tools.ScalingProbe <cores> <nRepos>
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val nRepos = if (args.length > 1 && !args(1).startsWith("/")) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    // 2nd arg: either a repo count (synthesize) or a parked edge
    // parquet path (read back — same contract as Bench's samples).
    val edges =
      if (args.length > 1 && args(1).startsWith("/")) spark.read.parquet(args(1))
      else {
        val corpus = RepoCorpus.generate(spark, RepoCorpus.Config(nRepos = nRepos, filesPerRepo = 4))
        EdgeExtraction.ingest(EdgeExtraction.withSha(corpus))._1
      }
    val parts = sys.env.get("PROBE_PARTS").map(_.toInt).getOrElse(cores)
    val adj = Adjacency.build(edges.repartition(parts), parts)
    val tBuild = (System.nanoTime() - t0) / 1e9
    println(f"[probe] cores=$cores parts=$parts V=${adj.numVertices} E=${adj.numEdges} buildSec=$tBuild%.1f")

    val iters = sys.env.get("PROBE_ITERS").map(_.toInt).getOrElse(10)
    val r = PageRank.run(adj, maxIters = iters)
    val loopSec = r.metrics.map(_.wallMs).sum / 1000.0
    val sorted = r.metrics.map(_.wallMs).sorted
    val medianSec =
      if (sorted.isEmpty) 0.0
      else if (sorted.size % 2 == 1) sorted(sorted.size / 2) / 1000.0
      else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2000.0
    r.metrics.foreach(m => println(s"[probe] iter=${m.iter} wallMs=${m.wallMs} active=${m.activeVertices}"))
    println(f"[probe] loopSec=$loopSec%.2f tput=${adj.numEdges * r.iterations / loopSec}%.0f edges/sec/superstep")
    // machine-readable summary for Bench's forked-JVM sampling
    println(s"""[probe-json] {"cores":$cores,"edges":${adj.numEdges},""" +
      f""""medianIterSec":$medianSec%.3f,"loopSec":$loopSec%.2f,"iters":${r.iterations}}""")
    spark.stop()
  }
}
