package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source-tree hygiene pins. Round 7 shipped two sources containing a
  * raw 0x00 byte (a `"\0"` literal) — git and grep treat such files as
  * binary, so diffs show `Bin … bytes` and review tooling goes blind.
  * The literals are now backslash-u0000 escapes; this spec keeps the whole
  * class of defect dead by asserting every `.scala` file under `src/`
  * is NUL-free (and, while we are here, valid UTF-8).
  */
class RepoHygieneSpec extends AnyFunSuite {

  private def scalaSources: Seq[Path] = {
    val root = Paths.get(sys.props.getOrElse("user.dir", ".")).resolve("src")
    assert(Files.isDirectory(root), s"expected source tree at $root")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  test("no .scala source contains a raw NUL (0x00) byte") {
    val offenders = scalaSources.filter { p =>
      Files.readAllBytes(p).contains(0.toByte)
    }
    assert(offenders.isEmpty,
      s"raw NUL bytes (use \\u0000 escapes instead) in: " +
        offenders.mkString(", "))
  }

  test("every .scala source decodes as strict UTF-8") {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    val offenders = scalaSources.filter { p =>
      try { dec.decode(java.nio.ByteBuffer.wrap(Files.readAllBytes(p))); false }
      catch { case _: java.nio.charset.CharacterCodingException => true }
    }
    assert(offenders.isEmpty, s"non-UTF-8 sources: ${offenders.mkString(", ")}")
  }
}
