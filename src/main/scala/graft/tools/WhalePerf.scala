package graft.tools
import graft.pipeline.{Corpus, ExtractKernel}
object WhalePerf {
  def main(args: Array[String]): Unit = {
    // whales are i % SKEW_EVERY == 0 && i > 0
    val whaleIds = (1 to 40).map(_ * Corpus.SKEW_EVERY.toLong)
    val whales = whaleIds.map(Corpus.row(42L))
    val pdfW = whales.filter(_.url.contains("pdf"))
    val htmlW = whales.filter(_.url.contains("html"))
    println(s"pdf whales: ${pdfW.size} avg ${pdfW.map(_.html.length).sum / math.max(pdfW.size,1)} bytes")
    println(s"html whales: ${htmlW.size} avg ${htmlW.map(_.html.length).sum / math.max(htmlW.size,1)} bytes")
    (1 to 2).foreach { _ => whales.foreach(ExtractKernel.extractOne) } // warm
    Seq(("pdf", pdfW), ("html", htmlW)).foreach { case (k, ws) =>
      if (ws.nonEmpty) {
        val t0 = System.nanoTime()
        ws.foreach(ExtractKernel.extractOne)
        val dt = (System.nanoTime() - t0) / 1e6
        println(f"$k whales: ${dt / ws.size}%.2f ms/doc")
      }
    }
  }
}
