package graft

import org.scalatest.funsuite.AnyFunSuite

/** The canary's committed-level resolution (Bench.resolveCommitted):
  * pin > lineage-derived > local[32] bootstrap constant > off — and
  * the lineage derivation must ignore inflated windows (a hot window
  * must never ratchet the calm level up) while accepting flag-off
  * windows (the non-reference-hardware self-bootstrap).
  */
class BenchCanarySpec extends AnyFunSuite {

  private def tmpLineage(lines: String*): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("canary_lineage", ".jsonl")
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    p
  }

  private def entry(cpus: Int, median: Double,
      inflated: Option[Boolean]): String = inflated match {
    case Some(b) =>
      s"""{"cpus":$cpus,"median":$median,"committed":0.57,"ratio":1.0,"inflated":$b,"provenance":"default"}"""
    case None =>
      s"""{"cpus":$cpus,"median":$median,"committed":null,"ratio":null,"inflated":null,"provenance":"off"}"""
  }

  test("an explicit pin wins over everything and reads as pinned") {
    val lineage = tmpLineage(entry(32, 0.40, Some(false)))
    assert(Bench.resolveCommitted("32", lineage, pin = Some(0.8)) ==
      (Some(0.8), "pinned"))
  }

  test("calm lineage windows at the same core count derive the level") {
    val lineage = tmpLineage(
      entry(32, 0.50, Some(false)),
      entry(32, 0.60, Some(false)),
      entry(32, 0.55, Some(false)))
    val (level, prov) = Bench.resolveCommitted("32", lineage, pin = None)
    assert(prov == "derived")
    assert(level.contains(0.55), "median of the three calm medians")
  }

  test("only the last N calm windows enter; older history is ignored") {
    // five old fast windows, then five newer slow ones: the derived
    // level must track the NEWER five (the self-re-pin semantics)
    val lineage = tmpLineage(
      (Seq.fill(5)(0.30) ++ Seq.fill(5)(0.60))
        .map(m => entry(32, m, Some(false))): _*)
    val (level, prov) = Bench.resolveCommitted("32", lineage, pin = None)
    assert(prov == "derived" && level.contains(0.60))
  }

  test("inflated windows never enter the derivation") {
    val lineage = tmpLineage(
      entry(32, 0.50, Some(false)),
      entry(32, 2.50, Some(true)), // a hot window must not ratchet the level
      entry(32, 0.52, Some(false)))
    val (level, prov) = Bench.resolveCommitted("32", lineage, pin = None)
    assert(prov == "derived")
    assert(level.exists(_ < 1.0), s"hot window leaked into the level: $level")
  }

  test("flag-off windows are calm-eligible (non-32-core self-bootstrap)") {
    val lineage = tmpLineage(entry(4, 3.10, None), entry(4, 3.30, None))
    val (level, prov) = Bench.resolveCommitted("4", lineage, pin = None)
    assert(prov == "derived" && level.contains(3.30),
      "run 1/2 seeded the lineage with the flag off; run 3 must derive")
  }

  test("other core counts' entries are invisible") {
    val lineage = tmpLineage(entry(4, 3.10, None))
    assert(Bench.resolveCommitted("32", lineage, pin = None) ==
      (Some(0.57), "default"), "local[32] falls back to the bootstrap constant")
    assert(Bench.resolveCommitted("8", lineage, pin = None) == (None, "off"),
      "off the reference count with no lineage at it, the flag stays off")
  }

  test("an all-inflated lineage falls back rather than deriving") {
    val lineage = tmpLineage(entry(32, 2.50, Some(true)))
    assert(Bench.resolveCommitted("32", lineage, pin = None) ==
      (Some(0.57), "default"))
  }

  test("a missing lineage file resolves like an empty one") {
    val p = java.nio.file.Paths.get("/tmp/graft_no_such_lineage.jsonl")
    java.nio.file.Files.deleteIfExists(p)
    assert(Bench.resolveCommitted("32", p, pin = None) ==
      (Some(0.57), "default"))
    assert(Bench.resolveCommitted("16", p, pin = None) == (None, "off"))
  }
}
