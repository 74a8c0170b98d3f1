package graft.ops

/** Where an artifact's `LATEST` version pointer lives — the ONE piece
  * of the versioned-pointer commit discipline whose atomicity depends
  * on the filesystem ([[Staging]]'s portability contract: rename is
  * atomic on local/HDFS but copy+delete on S3A). Everything else the
  * discipline writes is immutable (version dirs, segments), so
  * swapping ONLY the pointer resolution out to an external commit log
  * closes the object-store atomic-publish caveat: segments and
  * manifests stay on the (cheap, eventually-consistent-safe) store,
  * while the pointer lives wherever the deployment can do an atomic
  * compare-and-swap — a JDBC database here; the same contract fits a
  * DynamoDB/ZooKeeper/etcd implementation.
  *
  * ==Contract==
  *  - [[current]]: the last successfully published version of `root`,
  *    None before the first publish.
  *  - [[publish]]: atomically advance `root`'s pointer to `n`.
  *    MONOTONIC: `n` must exceed the stored version — a stale or
  *    duplicate writer (two uncoordinated processes committing the
  *    same artifact) must fail LOUDLY, never silently move the pointer
  *    backwards over a newer commit. A publish that throws leaves the
  *    pointer unchanged; the orphaned version dir is uncommitted by
  *    definition and reclaimed by the next writer's
  *    [[Staging.nextVersionDir]] / [[Staging.gcSegments]].
  *
  * The store serializes the POINTER, not the version-dir writes:
  * single-writer-per-artifact remains the commit discipline. Two
  * concurrent writers can resolve the same next version number and
  * overwrite each other's dir BEFORE either publishes
  * ([[Staging.nextVersionDir]] clears the target) — the losing
  * publish fails loudly, but the winning pointer may then name a dir
  * the loser partially rewrote. The store's guarantee is the one a
  * blob store cannot give (no torn/backward pointer, losers surface
  * as errors instead of silent corruption); writer mutual exclusion
  * is the deployment's job (one maintainer stream per artifact — the
  * [[graft.streaming.Maintenance]] loops are built that way).
  *
  * Readers inside one process see their own publishes immediately
  * (both implementations are strongly consistent).
  */
trait PointerStore {
  def current(root: String): Option[Long]
  def publish(root: String, n: Long): Unit
}

object PointerStore {

  /** The default store: `root/LATEST` via the Hadoop FileSystem API —
    * tmp-file + rename-with-overwrite, atomic on local/HDFS (the
    * pre-extraction behavior, unchanged byte-for-byte on disk, so
    * every existing artifact keeps working).
    */
  object File extends PointerStore {
    def current(root: String): Option[Long] = {
      val p = s"$root/LATEST"
      if (Staging.exists(p)) Some(Staging.readString(p).trim.toLong)
      else None
    }
    def publish(root: String, n: Long): Unit = {
      // best-effort monotonic guard: a read-then-swap cannot be atomic
      // on a filesystem (exactly the caveat [[PointerStore.Jdbc]]
      // closes), but it upgrades the common stale-writer mistakes —
      // double-commit bugs, a crashed writer retrying an already
      // published version — from a silent backward pointer move to a
      // loud failure
      current(root).filter(_ >= n).foreach(c =>
        throw new IllegalStateException(
          s"PointerStore.File: $root already at version $c >= $n — " +
            "stale or duplicate writer; refusing to move the pointer " +
            "backwards"))
      val tmp = s"$root/.LATEST.tmp"
      Staging.writeString(tmp, n.toString)
      Staging.atomicRename(tmp, s"$root/LATEST")
    }
  }

  /** JDBC-backed commit log: one row per artifact root in `table`,
    * advanced by a transactional compare-and-swap (`UPDATE … WHERE
    * root = ? AND version < ?` — zero rows updated means a concurrent
    * or stale writer, surfaced as IllegalStateException). This is the
    * object-store deployment path ([[Staging]]'s S3A caveat): the
    * database serializes the swap, so a reader sees the old complete
    * version or the new one, never a torn pointer, regardless of the
    * blob store's rename semantics.
    *
    * Engine-neutral SQL (tested against embedded Derby, the only JDBC
    * engine shipped with Spark — same move as [[graft.sources.Jdbc]]);
    * a Postgres/MySQL deployment changes the URL, nothing else. One
    * connection per call: pointer ops are O(commits), not O(rows) —
    * pool at the deployment layer if commits are frequent.
    */
  final class Jdbc(url: String,
                   table: String = "graft_pointers") extends PointerStore {

    private def withConn[A](f: java.sql.Connection => A): A = {
      val c = java.sql.DriverManager.getConnection(url)
      try f(c) finally c.close()
    }

    /** Create the pointer table if absent (Derby has no IF NOT EXISTS;
      * the duplicate-object error is the documented probe).
      */
    private def ensureTable(c: java.sql.Connection): Unit = {
      val st = c.createStatement()
      try st.executeUpdate(s"CREATE TABLE $table (" +
        "root VARCHAR(1024) NOT NULL PRIMARY KEY, version BIGINT NOT NULL)")
      catch {
        case e: java.sql.SQLException
          if e.getSQLState == "X0Y32" || // Derby: object already exists
            e.getSQLState == "42S01" => () // SQL standard: table exists
      } finally st.close()
    }

    def current(root: String): Option[Long] = withConn { c =>
      ensureTable(c)
      val ps = c.prepareStatement(
        s"SELECT version FROM $table WHERE root = ?")
      try {
        ps.setString(1, root)
        val rs = ps.executeQuery()
        try if (rs.next()) Some(rs.getLong(1)) else None
        finally rs.close()
      } finally ps.close()
    }

    def publish(root: String, n: Long): Unit = withConn { c =>
      ensureTable(c)
      c.setAutoCommit(false)
      try {
        val up = c.prepareStatement(
          s"UPDATE $table SET version = ? WHERE root = ? AND version < ?")
        val advanced =
          try { up.setLong(1, n); up.setString(2, root); up.setLong(3, n)
            up.executeUpdate() == 1 }
          finally up.close()
        if (!advanced) {
          // no row advanced: either first publish (insert) or a newer/
          // equal version already stored (stale writer — fail loudly)
          val ins = c.prepareStatement(
            s"INSERT INTO $table (root, version) VALUES (?, ?)")
          try { ins.setString(1, root); ins.setLong(2, n)
            ins.executeUpdate() }
          catch {
            case e: java.sql.SQLException if e.getSQLState == "23505" =>
              throw new IllegalStateException(
                s"PointerStore.Jdbc: $root already at version >= $n — " +
                  "a concurrent or stale writer lost the commit race. " +
                  "The pointer is unchanged; if two writers shared this " +
                  "artifact, the published dir may hold the loser's " +
                  "files (single-writer-per-artifact is the commit " +
                  "discipline — see the PointerStore scaladoc)")
          } finally ins.close()
        }
        c.commit()
      } catch { case t: Throwable => c.rollback(); throw t }
    }
  }
}
