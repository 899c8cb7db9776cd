package graft

import org.scalatest.funsuite.AnyFunSuite

/** The canary's committed-level resolution (Bench.resolveCommitted):
  * pin > lineage-derived > local[32] bootstrap constant > off. The
  * derived level is the MINIMUM of the last N window medians at the
  * same core count (r14 review): a median-of-calm scheme ratchets
  * upward under sustained sub-threshold drift and can be poisoned by
  * a hot flag-off bootstrap window; the min is immune to both — a hot
  * window can never raise it, and one calm window anywhere in the
  * last N pins it at calm.
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

  test("the derived level is the min of the recent windows at this core count") {
    val lineage = tmpLineage(
      entry(32, 0.50, Some(false)),
      entry(32, 0.60, Some(false)),
      entry(32, 0.55, Some(false)))
    assert(Bench.resolveCommitted("32", lineage, pin = None) ==
      (Some(0.50), "derived"))
  }

  test("sustained sub-threshold drift cannot ratchet the level (the live r14 sequence)") {
    // the literal sequence the median-of-calm scheme compounded on:
    // bootstrap 0.57 -> window 0.600 (1.05x, calm) -> window 0.710
    // (1.18x vs the drifted level, calm) — the level must stay pinned
    // at the calmest recent window, not follow the drift
    val lineage = tmpLineage(
      entry(32, 0.600, Some(false)),
      entry(32, 0.710, Some(false)))
    assert(Bench.resolveCommitted("32", lineage, pin = None) ==
      (Some(0.600), "derived"),
      "the drifted window must not become the new calm level")
  }

  test("only the last N windows enter; older history ages out") {
    // five old fast windows, then five newer slow ones: a genuine
    // hardware slowdown converges once the fast minima age out
    val lineage = tmpLineage(
      (Seq.fill(5)(0.30) ++ Seq.fill(5)(0.60))
        .map(m => entry(32, m, Some(false))): _*)
    assert(Bench.resolveCommitted("32", lineage, pin = None) ==
      (Some(0.60), "derived"))
  }

  test("a hot window can never raise the level") {
    val lineage = tmpLineage(
      entry(32, 0.50, Some(false)),
      entry(32, 2.50, Some(true)), // a flagged-hot window is harmless under min
      entry(32, 0.52, Some(false)))
    assert(Bench.resolveCommitted("32", lineage, pin = None) ==
      (Some(0.50), "derived"))
  }

  test("flag-off windows seed the level (non-32-core self-bootstrap)") {
    val lineage = tmpLineage(entry(4, 3.30, None), entry(4, 3.10, None))
    assert(Bench.resolveCommitted("4", lineage, pin = None) ==
      (Some(3.10), "derived"),
      "runs 1/2 seeded the lineage with the flag off; run 3 must derive")
  }

  test("a hot flag-off bootstrap window is displaced by the first calm one") {
    // the poisoned-seed scenario: run 1 on new hardware lands under
    // co-tenant load (median 6.0, flag off), run 2 is calm (3.1) —
    // the min takes the calm window, so the poison never sticks
    val lineage = tmpLineage(entry(4, 6.00, None), entry(4, 3.10, None))
    assert(Bench.resolveCommitted("4", lineage, pin = None) ==
      (Some(3.10), "derived"))
  }

  test("other core counts' entries are invisible") {
    val lineage = tmpLineage(entry(4, 3.10, None))
    assert(Bench.resolveCommitted("32", lineage, pin = None) ==
      (Some(0.57), "default"), "local[32] falls back to the bootstrap constant")
    assert(Bench.resolveCommitted("8", lineage, pin = None) == (None, "off"),
      "off the reference count with no lineage at it, the flag stays off")
  }

  test("a missing lineage file resolves like an empty one") {
    val p = java.nio.file.Paths.get("/tmp/graft_no_such_lineage.jsonl")
    java.nio.file.Files.deleteIfExists(p)
    assert(Bench.resolveCommitted("32", p, pin = None) ==
      (Some(0.57), "default"))
    assert(Bench.resolveCommitted("16", p, pin = None) == (None, "off"))
  }
}
