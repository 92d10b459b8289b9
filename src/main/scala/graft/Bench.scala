package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark. Two phases:
  *
  *  1. Headline `SparkEntry.queries` timings on SPARK_GRAFT_SF_DIR at
  *     local[SPARK_GRAFT_CPUS].
  *  2. Cluster-size scaling evidence (BASELINE.json north_rule): the
  *     identical PageRank job — synthetic repo corpus → edge
  *     extraction → 10 supersteps — run at two parallelism levels
  *     (N = cpus/4 and 4N = cpus cores, shuffle partitions matched),
  *     both STRONG (same input) and WEAK (input scaled 4× with cores)
  *     scaling. Weak-scaling efficiency t_N / t_4N-on-4×-data is the
  *     cluster criterion analog: 4× executors should sustain ~4×
  *     edges/sec on 4× data.
  *
  * Emits ONE JSON line {"metric","value","unit","queries","sf",...}
  * plus writes BENCH.md with the scaling table.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One PageRank scaling sample: corpus(nRepos) → edges → 10
    * supersteps. Returns (numEdges, superstepLoopSec, edgesPerSecPerSuperstep). */
  private def prSample(cpus: Int, nRepos: Long): (Long, Double, Double) = {
    val spark = session(cpus)
    try {
      import graft.ingest._
      import graft.graph._
      import graft.algos._
      val corpus = RepoCorpus.generate(spark,
        RepoCorpus.Config(nRepos = nRepos, filesPerRepo = 4))
      val (edges, _) = EdgeExtraction.ingest(EdgeExtraction.withSha(corpus))
      val adj = Adjacency.build(edges.repartition(cpus), cpus)
      val iters = 10
      val r = PageRank.run(adj, maxIters = iters)
      val loopSec = r.metrics.map(_.wallMs).sum / 1000.0
      val tput = adj.numEdges.toDouble * iters / loopSec
      adj.unpersist()
      (adj.numEdges, loopSec, tput)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // ---- phase 1: headline query timings (skippable while iterating
    // on the scaling phase)
    val results =
      if (sys.env.contains("SPARK_GRAFT_BENCH_SKIP_QUERIES")) Seq.empty[(String, Double)]
      else {
        val spark = session(cpus)
        val r = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
          name -> (System.nanoTime() - t0) / 1e9
        }
        spark.stop()
        r
      }

    // ---- phase 2: scaling (N vs 4N cores)
    val hi = cpus
    val lo = math.max(2, cpus / 4)
    val baseRepos = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPOS", "600000").toLong
    val (eLo, tLoSec, tputLo) = prSample(lo, baseRepos)        // N cores, 1× data
    val (eHiS, tHiSSec, tputHiStrong) = prSample(hi, baseRepos) // 4N cores, 1× data
    val (eHiW, tHiWSec, tputHiWeak) = prSample(hi, baseRepos * (hi / lo)) // 4N, 4× data
    val strongEff = tputHiStrong / (tputLo * (hi.toDouble / lo))
    val weakEff = tputHiWeak / (tputLo * (hi.toDouble / lo))

    val bench =
      s"""# BENCH — measured (local-mode scaling evidence)
         |
         |PageRank, 10 supersteps, synthetic repo-link edge table
         |(RepoCorpus seed=42 → EdgeExtraction), superstep-loop wall time
         |only (adjacency build excluded). "Executor" analog = local core.
         |
         || config | edges | loop sec | edges/sec/superstep |
         ||---|---|---|---|
         || N=$lo cores, 1× data | $eLo | ${f"$tLoSec%.2f"} | ${f"$tputLo%.0f"} |
         || 4N=$hi cores, 1× data (strong) | $eHiS | ${f"$tHiSSec%.2f"} | ${f"$tputHiStrong%.0f"} |
         || 4N=$hi cores, 4× data (weak) | $eHiW | ${f"$tHiWSec%.2f"} | ${f"$tputHiWeak%.0f"} |
         |
         |- strong-scaling efficiency = tput(4N,1×) / (4 · tput(N,1×)) = ${f"$strongEff%.3f"}
         |- weak-scaling efficiency  = tput(4N,4×) / (4 · tput(N,1×)) = ${f"$weakEff%.3f"}
         |  (the north_rule criterion analog: 4× parallelism on 4× data ⇒ ≥0.8·4× throughput)
         |""".stripMargin
    Files.writeString(Paths.get("BENCH.md"), bench)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val scaling =
      s"""{"cores_lo":$lo,"cores_hi":$hi,"edges_lo":$eLo,"edges_hi_weak":$eHiW,""" +
        s""""tput_lo":${f"$tputLo%.0f"},"tput_hi_strong":${f"$tputHiStrong%.0f"},""" +
        s""""tput_hi_weak":${f"$tputHiWeak%.0f"},"strong_eff":${f"$strongEff%.3f"},""" +
        s""""weak_eff":${f"$weakEff%.3f"}}"""
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","pr_edges_per_sec_per_superstep":${f"$tputHiWeak%.0f"},"scaling":$scaling}""")
  }
}
