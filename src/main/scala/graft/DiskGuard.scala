package graft

/** Pre-flight disk guard for the heavy rehearsal writes (r15 verdict
  * #6): the B25 flat loop's first 100x batch wrote >78 GB of join
  * shuffle and filled the disk before dying — a failure mode that
  * wastes an hour of rehearsal wall time and leaves torn work dirs.
  * The generalized lesson: a main that is ABOUT to materialize a
  * projectable volume (a backlog rewrite of a known table, a banded
  * join whose candidate count is computable from the index) estimates
  * the bytes FIRST and refuses loudly — naming what was projected,
  * against what free space, and the recovery — when the projection
  * exceeds a configurable fraction of the filesystem's usable space.
  *
  * The check core is pure ([[check]]) so the spec can feed doctored
  * projections; [[require]] reads the real filesystem.
  */
object DiskGuard {

  /** One projected write: what it is, how many bytes, and what the
    * operator should do when it doesn't fit.
    */
  final case class Projection(what: String, projectedBytes: Long,
      recovery: String)

  /** Fraction of usable disk a single projection may claim — beyond
    * it the run refuses. Overridable per run (the env knob) because
    * the right ceiling differs between a scratch volume and a shared
    * root fs.
    */
  def defaultFraction: Double =
    sys.env.get("SPARK_GRAFT_DISK_GUARD_FRACTION").map(_.toDouble)
      .getOrElse(0.5)

  /** Pure core: Some(refusal message) when the projection exceeds
    * `fraction` of `usableBytes`, None when it fits. The message
    * names the projection, the numbers, and the recovery — a refusal
    * the operator can act on without reading source.
    */
  private[graft] def check(usableBytes: Long, p: Projection,
      fraction: Double): Option[String] = {
    val budget = (usableBytes * fraction).toLong
    if (p.projectedBytes <= budget) None
    else Some(
      f"disk guard: ${p.what} projects ${p.projectedBytes / 1e9}%.1f GB " +
        f"but only ${budget / 1e9}%.1f GB is within the guard budget " +
        f"(${fraction * 100}%.0f%% of ${usableBytes / 1e9}%.1f GB usable) " +
        s"- refusing before writing. Recovery: ${p.recovery} " +
        "(or raise SPARK_GRAFT_DISK_GUARD_FRACTION if the volume " +
        "really has the headroom)")
  }

  /** Refuse (IllegalStateException) when `p` does not fit on the
    * filesystem holding `dir`.
    */
  def require(dir: String, p: Projection,
      fraction: Double = defaultFraction): Unit = {
    val path = java.nio.file.Paths.get(dir).toAbsolutePath
    // walk up to the nearest existing ancestor — work dirs are
    // usually created AFTER the guard runs
    var probe = path
    while (!java.nio.file.Files.exists(probe) && probe.getParent != null)
      probe = probe.getParent
    val usable = java.nio.file.Files.getFileStore(probe).getUsableSpace
    check(usable, p, fraction).foreach(m => throw new IllegalStateException(m))
  }

  /** On-disk bytes of a table directory (the projection source for
    * backlog rewrites, which materialize roughly the same volume).
    */
  def dirBytes(dir: String): Long = {
    val f = new java.io.File(dir)
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(c => dirBytes(c.getPath)).sum)
      .getOrElse(0L)
  }
}
