package graft.tools
import graft.pipeline.{Corpus, ExtractKernel}
object WhaleProf {
  def main(args: Array[String]): Unit = {
    val whales = (1 to 40).map(i => Corpus.row(42L)(i * Corpus.SKEW_EVERY.toLong))
      .filter(_.url.contains("pdf"))
    whales.foreach(ExtractKernel.extractOne) // warm
    val worker = new Thread(() => {
      (1 to 50).foreach(_ => whales.foreach(ExtractKernel.extractOne))
    })
    worker.setName("whale-worker")
    worker.start()
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    while (worker.isAlive) {
      Thread.sleep(5)
      val st = worker.getStackTrace
      // find the deepest graft frame
      st.find(f => f.getClassName.startsWith("graft.core")).foreach { f =>
        val key = f.getClassName.split("\\.").last + "." + f.getMethodName
        counts(key) = counts.getOrElse(key, 0) + 1
      }
    }
    counts.toSeq.sortBy(-_._2).take(15).foreach { case (k, v) => println(f"$v%5d  $k") }
  }
}
