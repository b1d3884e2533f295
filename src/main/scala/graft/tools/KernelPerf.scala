package graft.tools

import graft.pipeline.{Corpus, ExtractKernel}

/** Single-threaded kernel micro-benchmark (no Spark): isolates per-document
  * extraction cost from scheduler/shuffle noise. Run with
  * `sbt "runMain graft.tools.KernelPerf [nDocs]"`. */
object KernelPerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    val rows = (0 until n).map(i => Corpus.row(42L)(i.toLong)).toArray
    // warmup (JIT)
    var w = 0
    while (w < 2) { rows.take(1000).foreach(ExtractKernel.extractOne); w += 1 }
    var rep = 0
    while (rep < 3) {
      val t0 = System.nanoTime()
      var ok = 0
      var i = 0
      while (i < rows.length) {
        if (ExtractKernel.extractOne(rows(i)).status == "ok") ok += 1
        i += 1
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"single-thread: $n docs in $dt%.3f s = ${n / dt}%.0f docs/s ($ok ok), ${dt * 1e3 / n}%.4f ms/doc")
      rep += 1
    }
  }
}
