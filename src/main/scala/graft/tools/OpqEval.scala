package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.SimSearch

/** Trained-OPQ evaluation: prints the per-iteration reconstruction-MSE
  * trajectory (iteration 0 = the random-rotation baseline) and the
  * identity-basis / random-rotation / trained-OPQ comparison on an
  * anisotropic synthetic frame — the numbers BASELINE.md quotes for the
  * "trained OPQ beats the random baseline" claim. Deterministic (seeded
  * generator, seeded rotation init), so the printed numbers are
  * reproducible: `runMain graft.tools.OpqEval [dim] [nVec]`. */
object OpqEval {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(64)
    val nVec = args.drop(1).headOption.map(_.toLong).getOrElse(5000L)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // clustered + per-dimension variance decay: the anisotropy that makes
    // axis-aligned PQ subvectors unbalanced (same shape as the OpsSpec gate)
    def randVec(seed: Long): Array[Float] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(dim) {
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
      }
    }
    val vecs = (0L until nVec).map { i =>
      val center = randVec(9000L + i % 8)
      val v = randVec(i).zip(center).map { case (r, c) => c + 0.15f * r }
      (i, v.zipWithIndex.map { case (x, j) => x / (1f + 0.35f * j) }.toSeq)
    }
    val cdf = vecs.toDF("vec_id", "embedding")

    val opq = SimSearch.trainOpq(cdf, m = 8, k = 16, dim = dim, opqIters = 6)
    val identity = Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f)
    val idCb = SimSearch.buildPqCodebook(cdf, m = 8, k = 16, dim = dim)
    val mseId = SimSearch.pqReconstructionMse(cdf, identity, idCb)
    println(f"""{"dim":$dim,"n":$nVec,"mse_identity":$mseId%.6f,""" +
      f""""mse_random":${opq.mseHistory.head}%.6f,"mse_opq":${opq.mseHistory.last}%.6f,""" +
      s""""history":[${opq.mseHistory.map(m => f"$m%.6f").mkString(",")}],""" +
      f""""opq_vs_random":${opq.mseHistory.last / opq.mseHistory.head}%.4f}""")
    spark.stop()
  }
}
