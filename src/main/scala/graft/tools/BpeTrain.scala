package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** One-shot deterministic BPE training over the synthetic documents corpus
  * (see graft.ops.Bpe for the tokenizer contract). The committed resource
  * was produced by:
  *
  *   sbt -batch "runMain graft.tools.BpeTrain /root/testdata/sf0.01 512 \
  *     src/main/resources/graft/bpe_merges.tsv"
  *
  * Determinism: word frequencies are exact (no sampling), the merge loop
  * picks (max pair frequency, then lexicographically smallest pair), and
  * training stops early when the best pair occurs < 2 times — retraining
  * on the same corpus is byte-identical.
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = if (args.length > 1) args(1).toInt else 512
    val outFile = if (args.length > 2) args(2) else "src/main/resources/graft/bpe_merges.tsv"
    val spark = SparkSession.builder().master("local[8]").appName("bpe-train")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // training text: the documents corpus plus the other textual columns of
    // the synthetic testdata (p_name: color+noun part names) plus the
    // committed multilingual langid samples — the synthetic corpus's
    // vocabulary is deliberately small (~31 words), so every in-repo text
    // source contributes coverage
    val wordFreq = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    def add(t: String): Unit = graft.ops.Bpe.pretokens(t).foreach(w => wordFreq(w) += 1L)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect().foreach(add)
    spark.read.parquet(s"$sfDir/part.parquet")
      .select("p_name").as[String].collect().foreach(add)
    graft.ops.TextOps.langSamples.foreach { case (_, t) => add(t) }
    spark.stop()

    def toSymbols(w: String): Vector[String] =
      (0 until w.length).map { i =>
        val s = String.valueOf(w.charAt(i))
        if (i == w.length - 1) s + graft.ops.Bpe.EOW else s
      }.toVector

    var vocab: Vector[(Vector[String], Long)] =
      wordFreq.iterator.map { case (w, f) => (toSymbols(w), f) }.toVector
    val merges = Vector.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val pairFreq = mutable.HashMap.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) { pairFreq((syms(i), syms(i + 1))) += f; i += 1 }
      }
      if (pairFreq.isEmpty) exhausted = true
      else {
        val (bestPair, bestFreq) = pairFreq.toSeq
          .minBy { case ((l, r), f) => (-f, l, r) }
        if (bestFreq < 2) exhausted = true
        else {
          merges += bestPair
          val merged = bestPair._1 + bestPair._2
          vocab = vocab.map { case (syms, f) =>
            if (syms.length < 2) (syms, f)
            else {
              val b = Vector.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == bestPair._1 && syms(i + 1) == bestPair._2) {
                  b += merged; i += 2
                } else { b += syms(i); i += 1 }
              }
              (b.result(), f)
            }
          }
          k += 1
        }
      }
    }
    val lines = merges.result().map { case (l, r) => s"$l\t$r" }
    val p = java.nio.file.Paths.get(outFile)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, String.join("\n", lines: _*).getBytes("UTF-8"))
    println(s"[bpe-train] ${lines.size} merges -> $outFile (${wordFreq.size} distinct words)")
  }
}
