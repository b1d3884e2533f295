package graft.tools

import java.nio.file.{Files, Paths}

/** Re-extract every *.pdf in a directory with the current kernel, writing
  * fresh .mine files for tools/refverify/compare.sh. */
object Redump {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args.headOption.getOrElse(sys.error("usage: Redump <dir>")))
    var n = 0
    Files.list(dir).filter(_.toString.endsWith(".pdf")).forEach { p =>
      val pdf = Files.readAllBytes(p)
      val mine =
        try graft.core.pdf.PdfExtract.pdf2txt(pdf)
        catch { case e: Throwable => ("KERNEL-ERR " + e.getClass.getName).getBytes }
      Files.write(Paths.get(p.toString.stripSuffix(".pdf") + ".mine"), mine)
      n += 1
    }
    println(s"redumped $n in $dir")
  }
}
