package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene guard (r18 VERDICT #4). A literal NUL byte once
  * landed inside a SnapshotLog scaladoc example (the `concat_ws`
  * composite-key spelling) and turned the repo's largest file BINARY to
  * grep/ripgrep and most editors — every future reviewer's tooling
  * degraded on exactly the file that needs it most. The byte is now
  * spelled with the backslash-u escape as text (safe in Scala 2.13 comments: unicode
  * escapes are only processed inside literals since 2.13.2), and this
  * spec keeps every source file text forever: no NUL or other C0
  * control bytes (tab and newline excepted) anywhere under src/.
  */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaFiles(root: String): Seq[Path] =
    Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq

  test("no source file contains NUL or stray control bytes") {
    val allowed: Set[Byte] = Set('\t'.toByte, '\n'.toByte, '\r'.toByte)
    val offenders = scalaFiles("src").flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val bad = bytes.zipWithIndex.collect {
        case (b, i) if b >= 0 && b < 0x20 && !allowed.contains(b) => (b, i)
      }
      bad.headOption.map { case (b, i) => s"$p: byte 0x%02x at offset %d".format(b, i) }
    }
    assert(offenders.isEmpty, s"control bytes in source:\n${offenders.mkString("\n")}")
  }
}
