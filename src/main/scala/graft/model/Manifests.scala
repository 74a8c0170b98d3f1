package graft.model

import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Driver-side manifest layer — the reference's JSON/YAML catalog files
  * re-expressed as case classes + JSON (reference: index.py:6-9,
  * dataset_types.py:7-19, utils.py:9-21; collections.yaml at
  * exporter.py:160-167 becomes collections.json here — same DAG, one
  * serialization stack).
  *
  * Manifests are small (dozens of entries) and driver-side by design —
  * the 100 TB data path never flows through them (SURVEY.md §7.4.6).
  */
object Manifests {

  implicit val fmts: Formats = DefaultFormats

  /** Export index (reference index.py:6-9): the entry point a consumer
    * reads first.
    */
  case class ExportIndex(
      dimensions: Seq[String],
      dataset_types: Seq[String],
      root_collection: String)

  /** Schema catalog entry (reference dataset_types.py:7-19): dataset
    * type name + its data-ID dimension columns + storage class.
    */
  case class DatasetTypeExport(
      name: String,
      dimensions: Seq[String],
      storage_class: String)

  /** One collection in the flattened chain (reference exporter.py:
    * 114-120): chains are resolved to an ordered priority list; each
    * child is TAGGED or CALIBRATION.
    */
  case class CollectionExport(
      name: String,
      collection_type: String, // RUN | TAGGED | CALIBRATION | CHAINED
      children: Seq[String])   // priority order for CHAINED, else empty

  /** Poisoned-filename guard (reference paths.py:20-24): every name that
    * becomes a path segment under the export/target root must match
    * `\w+(.\w*)?` so `../x`, absolute paths, or separator-bearing names
    * cannot escape the directory tree. Same regex as the reference.
    */
  def requireSafeName(kind: String, name: String): Unit =
    require(name.matches("^\\w+\\.?\\w*$"),
      s"$kind name is not a safe path segment: '$name'")

  def writeJson[A <: AnyRef](path: String, a: A): Unit = {
    // getParent is null for a bare filename — nothing to create then
    Option(Paths.get(path).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(path), Serialization.writePretty(a))
  }

  def readIndex(path: String): ExportIndex =
    JsonMethods.parse(Files.readString(Paths.get(path))).extract[ExportIndex]

  def readDatasetTypes(path: String): Seq[DatasetTypeExport] =
    JsonMethods.parse(Files.readString(Paths.get(path))).extract[Seq[DatasetTypeExport]]

  def readCollections(path: String): Seq[CollectionExport] =
    JsonMethods.parse(Files.readString(Paths.get(path))).extract[Seq[CollectionExport]]

  /** Collections manifest as YAML (reference exporter.py:160-167; read back
    * at importer.py:51): Butler's export backend writes a document with a
    * `data:` list of collection entries. The dependency budget carries no
    * YAML library, so this emits/parses exactly the restricted subset that
    * layout needs — block mapping entries, single-quoted scalars ('' escape),
    * flow-style children lists.
    */
  def writeCollectionsYaml(path: String, collections: Seq[CollectionExport]): Unit = {
    // corruption guard: the single-quote escape covers quotes, but a
    // control character would split a line under the line-based parser
    // and silently mis-read every later entry — fail at write time
    collections.foreach { c =>
      (c.name +: c.children).foreach { s =>
        require(!s.exists(ch => ch == '\n' || ch == '\r'),
          s"collection name contains a line break (unrepresentable in the " +
            s"YAML manifest): ${s.replace("\n", "\\n").replace("\r", "\\r")}")
      }
    }
    val sb = new StringBuilder
    sb ++= "description: Graft Data Repository Export\n"
    sb ++= "version: 1.0.2\n"
    sb ++= "data:\n"
    collections.foreach { c =>
      sb ++= "- type: collection\n"
      sb ++= s"  collection_type: ${c.collection_type}\n"
      sb ++= s"  name: ${yamlQuote(c.name)}\n"
      if (c.children.nonEmpty)
        sb ++= s"  children: [${c.children.map(yamlQuote).mkString(", ")}]\n"
    }
    Files.createDirectories(Paths.get(path).getParent)
    Files.writeString(Paths.get(path), sb.result())
  }

  /** Parses exactly the restricted YAML subset [[writeCollectionsYaml]]
    * emits. A genuine Butler-backend manifest may use constructs this
    * parser does NOT understand — block-style children lists
    * (`children:` followed by indented `- name` lines) — and silently
    * dropping them would mis-read a real manifest, so unsupported
    * constructs throw instead (importer callers fall back to the JSON
    * manifest or convert the file).
    */
  def readCollectionsYaml(path: String): Seq[CollectionExport] = {
    import scala.jdk.CollectionConverters._
    val out = scala.collection.mutable.ArrayBuffer[CollectionExport]()
    var fields = Map.empty[String, String]
    def flush(): Unit = {
      fields.get("type") match {
        case Some("collection") =>
          out += CollectionExport(
            yamlUnquote(fields("name")),
            yamlUnquote(fields.getOrElse("collection_type", "RUN")),
            fields.get("children").map { v =>
              val body = v.trim.stripPrefix("[").stripSuffix("]").trim
              if (body.isEmpty) Seq.empty[String] else splitFlow(body)
            }.getOrElse(Nil))
        case Some("run") => // Butler emits runs as their own entry type
          out += CollectionExport(yamlUnquote(fields("name")), "RUN", Nil)
        case _ => ()
      }
      fields = Map.empty
    }
    def addKv(s: String): Unit = {
      val idx = s.indexOf(':')
      require(idx >= 0,
        s"unsupported YAML construct in $path (only the graft-written " +
          s"subset is parseable; convert block-style entries): '$s'")
      val (k, v) = (s.take(idx).trim, s.drop(idx + 1).trim)
      require(k != "children" || v.nonEmpty,
        s"unsupported YAML construct in $path: block-style 'children:' " +
          "list (only flow-style [a, b] children are parseable)")
      fields += (k -> v)
    }
    Files.readAllLines(Paths.get(path)).asScala.foreach { raw =>
      if (raw.startsWith("- ")) { flush(); addKv(raw.drop(2)) }
      else if (raw.startsWith("  ")) addKv(raw.drop(2))
      // top-level header keys (description/version/data) carry no entry state
    }
    flush()
    out.toSeq
  }

  private def yamlQuote(s: String): String =
    "'" + s.replace("'", "''") + "'"

  private def yamlUnquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("'") && t.endsWith("'"))
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  /** Quote-aware split of a flow-list body on commas. */
  private def splitFlow(body: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < body.length) {
      val ch = body.charAt(i)
      if (inQ && ch == '\'' && i + 1 < body.length && body.charAt(i + 1) == '\'') {
        cur ++= "''"; i += 1
      } else if (ch == '\'') { inQ = !inQ; cur += ch }
      else if (ch == ',' && !inQ) { parts += cur.result(); cur.clear() }
      else cur += ch
      i += 1
    }
    parts += cur.result()
    parts.toSeq.map(yamlUnquote)
  }

  /** Flatten a collection DAG to the priority-ordered list of concrete
    * (non-chained) collections reachable from `root` — find_first's
    * priority index (reference exporter.py:114-120). Depth-first,
    * children in declared order, first occurrence wins.
    */
  def flattenChain(collections: Seq[CollectionExport], root: String): Seq[String] = {
    val byName = collections.map(c => c.name -> c).toMap
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    // cycle + diamond guard: manifests are EXTERNAL input (YAML/JSON),
    // so a cyclic chain must fail diagnosably (like topoSortDimensions)
    // rather than StackOverflow, and a diamond must not re-walk its
    // shared subtree exponentially
    val visiting = scala.collection.mutable.LinkedHashSet[String]()
    val done = scala.collection.mutable.HashSet[String]()
    def walk(name: String): Unit = byName.get(name) match {
      case _ if done.contains(name) => ()
      case _ if visiting.contains(name) =>
        throw new IllegalArgumentException(
          s"collection chain cycle: ${visiting.mkString(" -> ")} -> $name")
      case Some(c) if c.collection_type == "CHAINED" =>
        visiting += name
        try c.children.foreach(walk) finally visiting -= name
        done += name
      case Some(c) => seen += c.name; done += name
      case None => throw new IllegalArgumentException(s"unknown collection: $name")
    }
    walk(root)
    seen.toSeq
  }

  /** Topological sort of dimensions by dependency (reference
    * importer.py:59-62 `universe.sorted`): parents before children,
    * name-ordered among ties for determinism. Kahn's algorithm;
    * cycles are a catalog bug and throw.
    */
  def topoSortDimensions(deps: Map[String, Seq[String]]): Seq[String] = {
    val all = (deps.keySet ++ deps.values.flatten).toSeq.sorted
    val inDeg = scala.collection.mutable.Map(
      // distinct: a duplicated dependency entry would count twice while
      // completion decrements once -> spurious "cycle" on acyclic input
      all.map(d => d -> deps.getOrElse(d, Nil).distinct.count(all.contains)): _*)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val ready = scala.collection.mutable.SortedSet[String](
      all.filter(inDeg(_) == 0): _*)
    while (ready.nonEmpty) {
      val d = ready.head; ready -= d; out += d
      all.filter(x => deps.getOrElse(x, Nil).contains(d)).foreach { x =>
        inDeg(x) -= 1
        if (inDeg(x) == 0) ready += x
      }
    }
    require(out.size == all.size,
      s"dimension dependency cycle among: ${all.diff(out).mkString(", ")}")
    out.toSeq
  }
}
