
import java.nio.file.{Files, Paths}
import graft.fixtures.PdfBuilder._
val outDir = "/tmp/refcmp4"
Files.createDirectories(Paths.get(outDir))
val rnd = new scala.util.Random(777L)
def randWord(): String = (0 until 1 + rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
var n = 0
while (n < 300) {
  val sb = new StringBuilder
  val mode = n % 3
  if (mode == 0) {
    // dense scattered boxes: stress makePlane clustering + is_between deferral
    val nBoxes = 5 + rnd.nextInt(120)
    var b = 0
    while (b < nBoxes) {
      sb.append("BT\n")
      sb.append(s"/F1 ${5 + rnd.nextInt(14)} Tf\n")
      sb.append(s"${20 + rnd.nextInt(560)} ${20 + rnd.nextInt(740)} Td\n")
      sb.append(s"(${randWord()}) Tj\n")
      sb.append("ET\n")
      b += 1
    }
  } else if (mode == 1) {
    // two fonts, rise, negative/extreme state values
    sb.append("BT\n/F1 12 Tf\n72 720 Td\n(alpha one) Tj\n")
    sb.append(s"${-5 + rnd.nextInt(10)} Ts\n(raised) Tj\n")
    sb.append("/F2 9 Tf\n0 -14 Td\n(font two line) Tj\n")
    sb.append(s"${-rnd.nextInt(40)} Tc\n(negTc) Tj\n")
    sb.append("0 Tc\n/F1 14 Tf\nT*\n(back) Tj\nET\n")
    sb.append("BT\n/F2 7 Tf\n300 400 Td\n[(kern) -2500 (far)] TJ\nET\n")
  } else {
    // overlapping same-position lines: group/merge edge
    val x = 100 + rnd.nextInt(100)
    val y = 500 + rnd.nextInt(100)
    var k = 0
    val reps = 2 + rnd.nextInt(5)
    while (k < reps) {
      sb.append(s"BT\n/F1 ${8 + rnd.nextInt(6)} Tf\n${x + rnd.nextInt(6)} ${y + rnd.nextInt(6)} Td\n(${randWord()}) Tj\nET\n")
      k += 1
    }
  }
  val pdf = onePage(bytes(sb.toString), Map("/F1" -> 5, "/F2" -> 6), Seq(courier(5), helvetica(6)))
  Files.write(Paths.get(s"$outDir/fz_$n.pdf"), pdf)
  try Files.write(Paths.get(s"$outDir/fz_$n.mine"), graft.core.pdf.PdfExtract.pdf2txt(pdf))
  catch { case e: Throwable => Files.write(Paths.get(s"$outDir/fz_$n.mine"), ("KERNEL-ERR " + e.getClass.getName).getBytes) }
  n += 1
}
println(s"fuzz2 dumped $n")
sys.exit(0)
