package graft

import graft.queries.Registry

/** Contract checks on the driver-facing query registry: the driver keys its
  * whole correctness gate off these maps, so structural slips (a duplicated
  * name silently shadowing a query, an oracle for a nonexistent query) must
  * fail fast here, not as a mysteriously shrunken CORRECTNESS file. */
class RegistrySpec extends SparkSpec {

  test("query names are unique (byName must not silently shadow)") {
    val names = Registry.all.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
  }

  test("every query is oracled — the zero-rows-only-checks invariant") {
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.mkString(", ")}")
  }

  test("headline set is non-trivial and every member resolves") {
    val hs = Registry.headlines
    assert(hs.size >= 20, s"headline set shrank to ${hs.size}")
    hs.foreach(q => assert(Registry.byName.contains(q.name)))
  }

  test("oracle SQL never references absolute paths or temp dirs") {
    // an oracle accidentally capturing a builder-side temp path would pass
    // locally and break on the driver
    Registry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("/tmp/") && !sql.contains("/root/repo"),
        s"$name oracle references a local path")
    }
  }
}
