
import java.nio.file.{Files, Paths}
import graft.fixtures.PdfBuilder._
val outDir = "/tmp/refcmp3"
Files.createDirectories(Paths.get(outDir))
// seeded differential fuzz: random text state + layout stress
val rnd = new scala.util.Random(20260816L)
def randWord(): String = {
  val n = 1 + rnd.nextInt(10)
  (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
}
def randTextOps(sb: StringBuilder): Unit = {
  val nShows = 1 + rnd.nextInt(25)
  var k = 0
  while (k < nShows) {
    rnd.nextInt(10) match {
      case 0 => sb.append((rnd.nextInt(200) / 4.0).toString + " Tc\n")
      case 1 => sb.append((rnd.nextInt(300) / 4.0).toString + " Tw\n")
      case 2 => sb.append((50 + rnd.nextInt(200)).toString + " Tz\n")
      case 3 => sb.append(rnd.nextInt(30).toString + " TL\n")
      case 4 => sb.append(s"${rnd.nextInt(8) + 4} 0 0 ${rnd.nextInt(8) + 4} ${rnd.nextInt(500)} ${rnd.nextInt(700)} Tm\n")
      case 5 => sb.append("T*\n")
      case 6 =>
        val kerns = (0 until 1 + rnd.nextInt(4)).map(_ => s"(${randWord()}) ${rnd.nextInt(2000) - 1000}").mkString(" ")
        sb.append(s"[$kerns (${randWord()})] TJ\n")
      case 7 => sb.append(s"(${randWord()} ${randWord()}) '\n")
      case 8 => sb.append(s"${rnd.nextInt(600) - 100} ${rnd.nextInt(800) - 100} Td\n")
      case _ => sb.append(s"(${randWord()} ${randWord()} ${randWord()}) Tj\n")
    }
    k += 1
  }
}
var n = 0
while (n < 300) {
  val sb = new StringBuilder
  val nBlocks = 1 + rnd.nextInt(4)
  var b = 0
  while (b < nBlocks) {
    sb.append("BT\n")
    sb.append(s"/F1 ${6 + rnd.nextInt(20)} Tf\n")
    sb.append(s"${rnd.nextInt(500)} ${100 + rnd.nextInt(600)} Td\n")
    randTextOps(sb)
    sb.append("ET\n")
    if (rnd.nextInt(4) == 0) sb.append("% comment line\n")
    if (rnd.nextInt(5) == 0) sb.append(s"q 1 0 0 1 ${rnd.nextInt(50)} ${rnd.nextInt(50)} cm\n")
    if (rnd.nextInt(5) == 0) sb.append("Q\n")
    b += 1
  }
  // random high-bit WinAnsi bytes via hex strings in a final block
  if (rnd.nextInt(3) == 0) {
    val hex = (0 until 4 + rnd.nextInt(12)).map(_ => "%02X".format(0x20 + rnd.nextInt(0xdf))).mkString
    sb.append(s"BT\n/F1 10 Tf\n72 60 Td\n<$hex> Tj\nET\n")
  }
  val font = if (rnd.nextBoolean()) courier(5) else helvetica(5)
  val pdf = onePage(bytes(sb.toString), Map("/F1" -> 5), Seq(font))
  Files.write(Paths.get(s"$outDir/fz_$n.pdf"), pdf)
  try Files.write(Paths.get(s"$outDir/fz_$n.mine"), graft.core.pdf.PdfExtract.pdf2txt(pdf))
  catch { case e: Throwable => Files.write(Paths.get(s"$outDir/fz_$n.mine"), ("KERNEL-ERR " + e.getClass.getName).getBytes) }
  n += 1
}
println(s"fuzz dumped $n")
sys.exit(0)
