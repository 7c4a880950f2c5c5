package graft

/** Shared local-filesystem helpers (scratch cleanup, memo staleness
  * keys) — one guarded implementation instead of per-file copies. */
object Fs {

  /** Recursive delete; missing or unlistable directories tolerated. */
  def rmRf(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(rmRf)
    f.delete()
  }

  /** Cheap content fingerprint (file names + sizes + mtimes) of
    * `dir/<table>.parquet` — keys caches that must go stale when the
    * table is regenerated in place. Unlistable subdirs contribute
    * nothing rather than NPE. */
  def tableFingerprint(dir: String, table: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val root = new java.io.File(dir, s"$table.parquet")
    if (!root.exists()) "absent"
    else walk(root).map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString(",")
  }
}
