package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared fixture-twin plumbing: derive each testdata table through a
  * per-table transform and land it as a SINGLE `name.parquet` FILE —
  * the layout both `Tables.load` and the DuckDB oracle views read
  * (used by [[NullFixture]] and [[UnicodeFixture]]).
  */
object FixtureIo {

  def writeTwin(spark: SparkSession, src: String, dst: String,
                transform: (String, DataFrame) => DataFrame): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(dst))
    graft.model.Tables.names.foreach { name =>
      val tmp = s"$dst/_tmp_$name"
      transform(name, graft.model.Tables.load(spark, src, name))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val listing = Files.list(Paths.get(tmp))
      val one = try {
        val part = listing.iterator()
        val it = new scala.collection.Iterator[java.nio.file.Path] {
          def hasNext = part.hasNext; def next() = part.next()
        }
        it.find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file written for $name"))
      } finally listing.close() // Files.list holds a directory handle
      Files.move(one, Paths.get(s"$dst/$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // drop the now-empty Spark output dir (part markers, _SUCCESS)
      graft.ops.Staging.deleteTree(Paths.get(tmp))
    }
  }
}
