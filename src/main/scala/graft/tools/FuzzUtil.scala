package graft.tools

import java.nio.file.{Files, Paths}

/** Shared plumbing for the differential-fuzz generators (FuzzR2..R11).
  * ONE home for the dump convention: `tools/refverify/compare.sh` and the
  * agree-on-error loop key on the literal "KERNEL-ERR <class>" prefix in
  * the .mine file — changing it here changes every generator at once
  * (ten private copies previously risked silent divergence). */
object FuzzUtil {

  /** write the (pdf, .mine) pair for one fuzz doc; kernel errors are
    * captured, never thrown, so a generator run always produces a
    * comparable pair */
  def dump(outDir: String, name: String, pdf: Array[Byte]): Unit = {
    Files.write(Paths.get(s"$outDir/$name.pdf"), pdf)
    val mine =
      try graft.core.pdf.PdfExtract.pdf2txt(pdf)
      catch { case e: Throwable => ("KERNEL-ERR " + e.getClass.getName).getBytes }
    Files.write(Paths.get(s"$outDir/$name.mine"), mine)
  }

  /** 1-8 lowercase letters off the caller's seeded Random — lowercase ONLY
    * so generated prose can never collide with PDF operator tokens (Tj,
    * BI, EI, ...) */
  def randWord(rnd: scala.util.Random): String = {
    val n = 1 + rnd.nextInt(8)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }
}
