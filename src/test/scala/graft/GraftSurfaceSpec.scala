package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The API front door's completeness gate: every PUBLIC method on
  * [[Graft]] must be (a) documented in the README's API table (as
  * `Graft.<name>`) and (b) exercised somewhere — referenced by a spec
  * or by an oracle-keyed query builder. A new public method that lands
  * without either fails here, so the user-facing surface can never
  * silently outgrow its documentation or its test coverage.
  *
  * Enumerates the surface via reflection (not a hand-kept list) so the
  * gate tracks the real object. Plain-constant val accessors are
  * exempt from the README row requirement but still must be referenced
  * somewhere outside Graft.scala.
  */
class GraftSurfaceSpec extends AnyFunSuite {

  private val repoRoot: Path = {
    // tests run with cwd = repo root (sbt default); fall back to
    // walking up from cwd until build.sbt appears, so an IDE runner
    // with a different cwd still resolves
    var p = Paths.get("").toAbsolutePath
    while (p != null && !Files.exists(p.resolve("build.sbt"))) p = p.getParent
    require(p != null, "could not locate the repo root (no build.sbt upward of cwd)")
    p
  }

  private def readAll(p: Path): String =
    new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)

  private lazy val readme = readAll(repoRoot.resolve("README.md"))

  /** Every .scala source under `dir`, path → content. */
  private def sources(dir: String): Seq[(String, String)] = {
    val root = repoRoot.resolve(dir)
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => (p.toString, readAll(p)))
      .toSeq
  }

  private lazy val testSources = sources("src/test")
    .filterNot(_._1.endsWith("GraftSurfaceSpec.scala"))
  private lazy val mainSources = sources("src/main")
    .filterNot(_._1.endsWith("Graft.scala"))

  /** The public surface: declared public methods of the Graft object,
    * minus compiler artifacts (default-argument synthesizers and
    * anything else carrying '$'). */
  private lazy val surface: Seq[String] =
    Graft.getClass.getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filterNot(_.isSynthetic)
      .map(_.getName)
      .filterNot(_.contains("$"))
      .distinct
      .sorted

  /** Constant accessors: still must be referenced, but a README API
    * row is not required for a plain value. */
  private val constants = Set("MaxQueryBatch", "PartnerConfKey", "DefaultPartner")

  test("the reflected surface is non-trivial (sanity)") {
    assert(surface.size >= 40, s"suspiciously small surface: $surface")
    assert(surface.contains("read") && surface.contains("upsert"))
  }

  test("every public Graft method has a README API row") {
    val missing = surface.filterNot(constants).filterNot { m =>
      ("""\bGraft\.""" + java.util.regex.Pattern.quote(m) + """\b""").r
        .findFirstIn(readme).isDefined
    }
    assert(missing.isEmpty,
      s"public Graft methods with no `Graft.<name>` row in README.md: " +
        s"${missing.mkString(", ")} — add an API-table row for each")
  }

  test("every public Graft method is exercised by a spec or an oracle key") {
    val missing = surface.filterNot { m =>
      val qm = java.util.regex.Pattern.quote(m)
      val facadeRef = ("""\bGraft\.""" + qm + """\b""").r
      val callRef = ("""\.""" + qm + """\s*[(\[{]""").r
      testSources.exists { case (_, s) =>
        facadeRef.findFirstIn(s).isDefined || callRef.findFirstIn(s).isDefined
      } || mainSources.exists { case (_, s) =>
        facadeRef.findFirstIn(s).isDefined
      }
    }
    assert(missing.isEmpty,
      s"public Graft methods never referenced by any spec or query " +
        s"builder: ${missing.mkString(", ")} — add coverage or remove " +
        "the method")
  }
}
