package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.ops.Scalars.PathOps

/** File-tree (symlink-farm) generation, the reference's third stage
  * (generate_dp1_file_tree.py:20-72): turn the datastore table into one
  * symlink per artifact mirroring the target cloud layout.
  *
  * Split into a *plan* (pure DataFrame — testable, optimizable) and an
  * *execution* (foreachPartition side effect). The reference used a
  * 16-thread pool on one machine; foreachPartition gives
  * executor-count x cores parallelism with the same idempotent
  * collision semantics (FileExistsError tolerated,
  * generate_dp1_file_tree.py:42-46).
  */
object FileTree {

  /** Build the symlink plan: strip `#fragment` suffixes, validate the
    * path shape, remap the prefix, and dedup many-to-one collisions
    * (several refs can point at the same artifact — the reference
    * tolerates FileExistsError; we dedup up front so the side-effect
    * stage is collision-free by construction).
    *
    * Output columns: link (relative path of the symlink), target
    * (absolute path the link points to).
    */
  def plan(datastore: DataFrame, pathCol: String,
           sourceRoot: String, remap: Seq[(String, String)]): DataFrame = {
    val stripped = PathOps.stripFragment(col(pathCol))
    val remapped = remap.foldLeft(stripped) { case (acc, (from, to)) =>
      regexp_replace(acc, "^" + java.util.regex.Pattern.quote(from), to)
    }
    datastore
      .filter(!stripped.rlike("^[\\w+]+://")) // absolute URLs are not linkable (import_dp1.py:92-93)
      .select(
        remapped.as("link"),
        concat_ws("/", lit(sourceRoot), stripped).as("target"))
      // DETERMINISTIC survivor when distinct targets collide on one
      // link (min target) — dropDuplicates picks an arbitrary row, so
      // the symlink's target would flip between runs/partitionings
      // (the §7.5 contract; same reason Relational.dedupBySubset exists)
      .groupBy("link").agg(min(col("target")).as("target"))
  }

  /** Execute the plan: create parent dirs + symlinks, one task per
    * partition. Existing IDENTICAL links are tolerated (idempotent
    * re-runs); an existing link with a DIFFERENT target fails loudly —
    * silently keeping it would leave a stale mapping no re-run can see.
    * Every link path is normalized and confined to `treeRoot`: a
    * tampered export's `../..` path must not plant links outside the
    * tree (the Import.scala poisoned-path threat model applied to the
    * datastore path column). The accumulator mirrors the reference's
    * progress counter (generate_dp1_file_tree.py:24,32-34).
    */
  def execute(plan: DataFrame, treeRoot: String,
              counter: Option[LongAccumulator] = None): Unit = {
    plan.select("link", "target").foreachPartition {
      rows: Iterator[org.apache.spark.sql.Row] =>
        val root = Paths.get(treeRoot).toAbsolutePath.normalize
        rows.foreach { r =>
          val link = root.resolve(r.getString(0)).normalize
          if (!link.startsWith(root))
            throw new IllegalArgumentException(
              s"link path escapes the tree root: ${r.getString(0)}")
          val target = Paths.get(r.getString(1))
          Files.createDirectories(link.getParent)
          try Files.createSymbolicLink(link, target)
          catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              val existing =
                if (Files.isSymbolicLink(link)) Files.readSymbolicLink(link)
                else null
              if (existing != target)
                throw new IllegalStateException(
                  s"existing link $link points to $existing, expected $target")
          }
          counter.foreach(_.add(1))
        }
    }
  }
}
