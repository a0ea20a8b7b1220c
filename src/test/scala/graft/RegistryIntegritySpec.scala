package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Registry ⊆ SURVEY + oracle-parse integrity gate.
  *
  * Round 6 landed q227 in the end-of-round snapshot with no SURVEY
  * §2.3 declaration, no spec, and an oracle that DuckDB could not even
  * parse (a CTE named after the GLOB keyword) — the exact
  * partial-implementation failure mode the reference's own post-mortem
  * documents (reference: docs/repo_integrity_failures.md:14-23,
  * remediated there by scripts/verify_repo_integrity.py). This suite
  * is the same remediation for this repo: an undeclared registration
  * or an unparseable oracle now fails `sbt test`, before the driver's
  * round gate can ever see it.
  */
class RegistryIntegritySpec extends AnyFunSuite {

  test("every registered query is declared in SURVEY §2.3") {
    val survey = Paths.get("SURVEY.md")
    assert(Files.exists(survey), "SURVEY.md must exist at the repo root")
    val missing = ops.Registry.undeclaredIn(Files.readString(survey))
    assert(missing.isEmpty,
      s"registered but undeclared in SURVEY §2.3: ${missing.mkString(", ")}")
  }

  test("registered query names are unique and well-formed") {
    val names = ops.Registry.all.map(_.name)
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate registrations: ${dupes.mkString(", ")}")
    val malformed = names.filterNot(_.matches("q\\d+_[a-z0-9_]+"))
    assert(malformed.isEmpty, s"non-conforming names: ${malformed.mkString(", ")}")
  }

  test("SparkEntry mirrors the registry exactly") {
    assert(SparkEntry.queries.keySet == ops.Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet ==
      ops.Registry.all.filter(_.oracle.isDefined).map(_.name).toSet)
  }

  test("SURVEY §2.3 no-oracle markers agree with the registry") {
    // A query claiming an oracle must not carry a no-oracle marker in
    // its SURVEY row, and a query without one must declare it — the
    // declaration and the code can't drift apart silently.
    val lines = Files.readAllLines(Paths.get("SURVEY.md"))
    def rowOf(name: String): Option[String] = {
      val it = lines.iterator()
      var found: Option[String] = None
      while (it.hasNext && found.isEmpty) {
        val l = it.next()
        if (l.startsWith(s"| `$name`")) found = Some(l)
      }
      found
    }
    def marked(l: String): Boolean =
      l.toLowerCase.contains("no-oracle") || l.toLowerCase.contains("rows-only")
    val bad = ops.Registry.all.flatMap { q =>
      rowOf(q.name).flatMap { row =>
        if (q.oracle.isDefined && marked(row))
          Some(s"${q.name}: has an oracle but its SURVEY row carries a no-oracle/rows-only marker")
        else if (q.oracle.isEmpty && !marked(row))
          Some(s"${q.name}: no oracle but its SURVEY row does not declare no-oracle/rows-only")
        else None
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("every no-oracle query is listed in the README audit table") {
    val readme = Files.readString(Paths.get("README.md"))
    val unaudited = ops.Registry.all
      .filter(_.oracle.isEmpty).map(_.name)
      .filterNot(n => readme.contains(s"`$n`"))
    assert(unaudited.isEmpty,
      s"no-oracle queries missing from the README audit table: ${unaudited.mkString(", ")}")
  }

  test("every oracle SQL string parses and binds in DuckDB") {
    val probe = Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ()))
    assume(probe == 0, "python3+duckdb unavailable — parse gate runs in driver/CI envs")
    val dir = Files.createTempDirectory("oraclesql")
    ops.Registry.all.foreach(q =>
      q.oracle.foreach(sql =>
        Files.writeString(dir.resolve(s"${q.name}.sql"), sql)))
    val out = new StringBuilder
    val code = Process(
      Seq("python3", "scripts/check_oracle_parse.py", "/root/testdata/sf0.001", dir.toString))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"oracle parse gate failed:\n$out")
  }
}
