package graft.tools
object TraceOne {
  def main(args: Array[String]): Unit = {
    val pdf = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0)))
    try {
      val out = graft.core.pdf.PdfExtract.pdf2txt(pdf)
      println("OK:\n" + new String(out, "UTF-8"))
    } catch { case e: Throwable =>
      println("ERR " + e)
      e.getStackTrace.take(12).foreach(f => println("  " + f))
    }
  }
}
