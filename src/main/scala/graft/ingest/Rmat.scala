package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic distributed RMAT/Kronecker edge generator — the same
  * family as the reference's benchmark graphs (RMAT26…30,
  * graphtap.slurm:45-68; sample data/rmat10_1024.bin is RMAT scale 10,
  * README.md:7). Default probabilities (a,b,c,d) = (.57,.19,.19,.05),
  * the Graph500 setting. Every edge is a pure function of
  * (seed, edge index): fully parallel, no driver state, identical
  * output at any partitioning — usable for both correctness diffs and
  * the two-parallelism scaling bench.
  */
object Rmat {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  @inline private def u01(z: Long): Double = (z >>> 11).toDouble / (1L << 53).toDouble

  def edges(spark: SparkSession, scale: Int, edgeFactor: Int = 16,
            a: Double = 0.57, b: Double = 0.19, c: Double = 0.19,
            seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val n = 1L << scale
    val m = n * edgeFactor
    spark.range(m).mapPartitions { it =>
      it.map { i =>
        var src = 0L; var dst = 0L
        var bit = 0
        var h = mix(seed ^ mix(i))
        while (bit < scale) {
          val u = u01(h)
          h = mix(h)
          if (u < a) { /* top-left */ }
          else if (u < a + b) { dst |= 1L << bit }
          else if (u < a + b + c) { src |= 1L << bit }
          else { src |= 1L << bit; dst |= 1L << bit }
          bit += 1
        }
        (src, dst)
      }
    }.toDF("src", "dst")
  }
}
