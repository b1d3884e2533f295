package graft.tools

import graft.pipeline.{Corpus, ExtractKernel}

/** Single-threaded kernel micro-benchmark (no Spark): isolates per-document
  * extraction cost from scheduler/shuffle noise. Run with
  * `sbt "runMain graft.tools.KernelPerf [nDocs]"`. */
object KernelPerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3000)
    val threads = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val rows = (0 until n).map(i => Corpus.row(42L)(i.toLong)).toArray
    val bytesTotal = rows.map(_.html.length.toLong).sum
    println(f"corpus: $n docs, ${bytesTotal / n} bytes/doc avg")
    // warmup (JIT)
    var w = 0
    while (w < 2) { rows.take(1000).foreach(ExtractKernel.extractOne); w += 1 }
    var rep = 0
    while (rep < 3) {
      val t0 = System.nanoTime()
      if (threads <= 1) {
        var i = 0
        while (i < rows.length) { ExtractKernel.extractOne(rows(i)); i += 1 }
      } else {
        val chunk = (rows.length + threads - 1) / threads
        val ts = (0 until threads).map { t =>
          new Thread(() => {
            var i = t * chunk
            val end = math.min(i + chunk, rows.length)
            while (i < end) { ExtractKernel.extractOne(rows(i)); i += 1 }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads: $n docs in $dt%.3f s = ${n / dt}%.0f docs/s, ${dt * 1e3 / n}%.4f ms/doc-wall")
      rep += 1
    }
  }
}
