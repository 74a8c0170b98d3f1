package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Shared filesystem plumbing for the staged-promote and
  * versioned-pointer write disciplines (one audited copy — Dedup's
  * durable graph, PretrainDemo's shard promote, and the fixture tools
  * all route through here; crash-safety code that exists twice drifts).
  */
object Staging {

  /** Recursively delete a directory tree (no-op if absent). */
  def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(x => Files.delete(x))

  /** Promote staged tables into place: per table, delete the previous
    * target and ATOMIC_MOVE `root/.staging/t` → `root/t`; then drop the
    * now-empty staging dir. Atomic PER TABLE, ordered across tables —
    * the documented weaker-than-ACID guarantee: a crash between moves
    * leaves a mixed set, so use [[writeVersioned]] when readers must
    * never observe a torn multi-table artifact.
    */
  def promote(root: String, tables: Seq[String]): Unit = {
    tables.foreach { t =>
      val tgt = Paths.get(s"$root/$t")
      deleteTree(tgt)
      Files.move(Paths.get(s"$root/.staging/$t"), tgt,
        StandardCopyOption.ATOMIC_MOVE)
    }
    // tree-delete, not deleteIfExists: anything staged but NOT in
    // `tables` (a stray _SUCCESS, a table the caller chose not to
    // promote) would leave the dir non-empty and throw
    // DirectoryNotEmptyException AFTER every move already succeeded —
    // unpromoted staging content is discarded by contract
    deleteTree(Paths.get(s"$root/.staging"))
  }

  /** Versioned-pointer commit: the caller writes a complete artifact
    * under `root/v<N+1>` (via the directory this returns), then
    * [[commitVersion]] atomically swings `root/LATEST` to it. Readers
    * resolve through the pointer, so a crash at ANY point before the
    * pointer swap leaves the previous version fully intact and
    * discoverable — no mixed-version window, unlike [[promote]].
    */
  def nextVersionDir(root: String): (String, Long) = {
    val n = currentVersion(root).getOrElse(0L) + 1L
    (s"$root/v$n", n)
  }

  def currentVersion(root: String): Option[Long] = {
    val p = Paths.get(s"$root/LATEST")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  def versionDir(root: String, n: Long): String = s"$root/v$n"

  /** Atomically publish version `n` (tmp-file + ATOMIC_MOVE of the
    * pointer), then best-effort delete superseded version dirs (a crash
    * during GC leaves unreferenced dirs, never a broken reader).
    */
  def commitVersion(root: String, n: Long): Unit = {
    val tmp = Paths.get(s"$root/.LATEST.tmp")
    Files.writeString(tmp, n.toString)
    Files.move(tmp, Paths.get(s"$root/LATEST"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    (1L until n).foreach(old => deleteTree(Paths.get(versionDir(root, old))))
  }
}
