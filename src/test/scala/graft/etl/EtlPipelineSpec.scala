package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Manifests
import graft.model.Manifests.CollectionExport

/** Golden end-to-end (SURVEY.md §5.4): a miniature data release runs
  * export -> import -> file tree; assertions mirror the reference's
  * operational semantics (find_first by chain priority, calibration
  * ranges all survive, idempotent re-import, symlink collision dedup).
  */
class EtlPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val collections = Seq(
    CollectionExport("root", "CHAINED", Seq("runs/v2", "runs/v1", "calib")),
    CollectionExport("runs/v2", "TAGGED", Nil),
    CollectionExport("runs/v1", "TAGGED", Nil),
    CollectionExport("calib", "CALIBRATION", Nil))

  private def mkTmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    Files.createDirectories(dst)
    val entries = {
      val s = Files.list(src)
      try s.toArray(Array.ofDim[java.nio.file.Path](_)).toSeq finally s.close()
    }
    entries.foreach { e =>
      val t = dst.resolve(e.getFileName)
      if (Files.isDirectory(e)) copyTree(e, t) else Files.copy(e, t)
    }
  }

  test("chain flattening: depth-first priority order") {
    assert(Manifests.flattenChain(collections, "root") ==
      Seq("runs/v2", "runs/v1", "calib"))
  }

  test("topo sort: parents before children, deterministic ties") {
    val order = Manifests.topoSortDimensions(Map(
      "visit" -> Seq("instrument"),
      "detector" -> Seq("instrument"),
      "visit_detector" -> Seq("visit", "detector"),
      "instrument" -> Nil))
    assert(order.indexOf("instrument") < order.indexOf("visit"))
    assert(order.indexOf("visit") < order.indexOf("visit_detector"))
    assert(order.indexOf("detector") < order.indexOf("visit_detector"))
    // deterministic: detector before visit (name order among ready set)
    assert(order == Seq("instrument", "detector", "visit", "visit_detector"))
  }

  test("topo sort rejects cycles") {
    intercept[IllegalArgumentException] {
      Manifests.topoSortDimensions(Map("a" -> Seq("b"), "b" -> Seq("a")))
    }
  }

  test("topo sort: duplicated dependency entries are not a spurious cycle") {
    // count()ing dups while decrementing once left the node at in-degree
    // 1 forever -> false 'cycle' on acyclic input
    assert(Manifests.topoSortDimensions(Map("b" -> Seq("a", "a"), "a" -> Nil))
      == Seq("a", "b"))
  }

  test("chain flattening: cycles fail diagnosably; diamonds walk once") {
    val cyclic = Seq(
      CollectionExport("a", "CHAINED", Seq("b")),
      CollectionExport("b", "CHAINED", Seq("a")))
    val e = intercept[IllegalArgumentException] {
      Manifests.flattenChain(cyclic, "a")
    }
    assert(e.getMessage.contains("cycle"), e.getMessage)
    // diamond: root -> (l, r) -> shared; shared's leaf emitted once
    val diamond = Seq(
      CollectionExport("root", "CHAINED", Seq("l", "r")),
      CollectionExport("l", "CHAINED", Seq("shared")),
      CollectionExport("r", "CHAINED", Seq("shared")),
      CollectionExport("shared", "CHAINED", Seq("leaf")),
      CollectionExport("leaf", "RUN", Nil))
    assert(Manifests.flattenChain(diamond, "root") == Seq("leaf"))
  }

  test("collections YAML manifest round-trips, incl. quoting edge cases") {
    val dir = mkTmp("graft-yaml")
    val gnarly = Seq(
      CollectionExport("root", "CHAINED", Seq("it's/v1", "plain", "a, b")),
      CollectionExport("it's/v1", "TAGGED", Nil),
      CollectionExport("plain", "CALIBRATION", Nil),
      CollectionExport("a, b", "TAGGED", Nil))
    Manifests.writeCollectionsYaml(s"$dir/collections.yaml", gnarly)
    assert(Manifests.readCollectionsYaml(s"$dir/collections.yaml") == gnarly)
  }

  test("collections YAML: unsupported constructs and corrupting names fail loudly") {
    val dir = mkTmp("graft-yaml-strict")
    // a genuine Butler manifest may use block-style children — silently
    // dropping them would mis-read the chain, so the parser throws
    Files.writeString(Paths.get(s"$dir/block.yaml"),
      "data:\n- type: collection\n  collection_type: CHAINED\n  name: root\n" +
        "  children:\n  - a\n  - b\n")
    val ex = intercept[IllegalArgumentException] {
      Manifests.readCollectionsYaml(s"$dir/block.yaml")
    }
    assert(ex.getMessage.contains("unsupported YAML"))
    // Butler emits runs as their own entry type: parsed as RUN collections
    Files.writeString(Paths.get(s"$dir/run.yaml"),
      "data:\n- type: run\n  name: 'runs/v1'\n" +
        "- type: collection\n  collection_type: TAGGED\n  name: 'tag'\n")
    assert(Manifests.readCollectionsYaml(s"$dir/run.yaml") == Seq(
      CollectionExport("runs/v1", "RUN", Nil),
      CollectionExport("tag", "TAGGED", Nil)))
    // a line break in a name would corrupt the line-based manifest:
    // rejected at write time, not read time
    intercept[IllegalArgumentException] {
      Manifests.writeCollectionsYaml(s"$dir/corrupt.yaml",
        Seq(CollectionExport("bad\nname", "TAGGED", Nil)))
    }
  }

  test("write-once guard: duplicate export names raise before any write") {
    val df = Seq((1, "x")).toDF("visit", "band")
    val dir = mkTmp("graft-dup")
    val ex = intercept[IllegalArgumentException] {
      Export.run(dir,
        types = Seq(
          Export.DatasetTypeInput("raw", "Exp", df, Seq("visit"), findFirst = true),
          Export.DatasetTypeInput("raw", "Exp", df, Seq("visit"), findFirst = true)),
        dimensions = Nil, datastore = df, collections = collections,
        rootCollection = "root")
    }
    assert(ex.getMessage.contains("raw"))
    assert(!Files.exists(Paths.get(s"$dir/datasets"))) // nothing written
    intercept[IllegalArgumentException] {
      Export.run(dir,
        types = Nil,
        dimensions = Seq(Export.DimensionInput("visit", df, Seq("visit"))),
        datastore = df, collections = collections, rootCollection = "root",
        expansions = Seq(Export.DimensionExpansion("visit", Seq("visit"),
          Export.DimensionInput("visit", df, Seq("visit")), Seq("visit"))))
    }
  }

  test("poisoned names cannot escape the export/target tree (paths.py guard)") {
    val df = Seq((1, "x")).toDF("visit", "band")
    val dir = mkTmp("graft-poison")
    val ex = intercept[IllegalArgumentException] {
      Export.run(dir,
        types = Seq(Export.DatasetTypeInput(
          "../evil", "Exp", df, Seq("visit"), findFirst = true)),
        dimensions = Nil, datastore = df, collections = collections,
        rootCollection = "root")
    }
    assert(ex.getMessage.contains("../evil"))
    assert(!Files.exists(Paths.get(s"$dir/datasets")))
    intercept[IllegalArgumentException] {
      Export.run(dir, types = Nil,
        dimensions = Seq(Export.DimensionInput("a/b", df, Seq("visit"))),
        datastore = df, collections = collections, rootCollection = "root")
    }
    // import side: a tampered index fails the same guard
    Files.createDirectories(Paths.get(s"$dir"))
    Manifests.writeJson(s"$dir/index.json",
      Manifests.ExportIndex(Seq("visit"), Seq("../up"), "root"))
    intercept[IllegalArgumentException] {
      Import.run(spark, dir, mkTmp("graft-poison-target"), Nil,
        Map("visit" -> Seq("visit")), Map("visit" -> Nil))
    }
  }

  test("datastore path mapping: first-match-wins, catch-all default, absolute-path guard") {
    val paths = Seq("ext/raw/f1", "shared/cat", "other/f2").toDF("p")
    // the reference's rucio layout as rules: two prefixes + catch-all
    val rules = Seq("ext/raw/" -> "raw/", "shared/" -> "raw/", "" -> "dp1/")
    val out = paths.select(Import.mappedPath(col("p"), rules).as("m"))
      .as[String].collect().toSet
    assert(out == Set("raw/f1", "raw/cat", "dp1/other/f2"))
    // no rules = null mapping: identity, validates nothing
    val abs = Seq("s3://bucket/x").toDF("p")
    assert(abs.select(Import.mappedPath(col("p"), Nil).as("m"))
      .as[String].head() == "s3://bucket/x")
    // with rules, a path still absolute after mapping fails the job
    // (import_dp1.py:92-97)
    val ex = intercept[Exception] {
      abs.select(Import.mappedPath(col("p"), Seq("gs://" -> "x/")).as("m")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("export -> import round trip with find_first and calib semantics") {
    val exportDir = mkTmp("graft-export")
    val targetDir = mkTmp("graft-target")

    // two revisions of visit 10 (v2 must win find_first), one unrevised
    val refs = Seq(
      ("id-a2", "runs/v2", "runs/v2", 10),
      ("id-a1", "runs/v1", "runs/v1", 10),
      ("id-b1", "runs/v1", "runs/v1", 20)
    ).toDF("dataset_id", "run", "collection", "visit")

    // calibration: same data ID, two disjoint validity ranges — both live
    val calibRefs = Seq(
      ("id-c1", "runs/v1", "calib", 1, Some((0L, 100L))),
      ("id-c2", "runs/v1", "calib", 1, Some((100L, 200L)))
    ).toDF("dataset_id", "run", "collection", "detector", "ts")
      .withColumn("timespan", struct(
        col("ts._1").as("begin_nsec"), col("ts._2").as("end_nsec")))
      .drop("ts")

    val visits = Seq((10, "r1"), (10, "r1"), (20, "r2")).toDF("visit", "band")
    // phase-2 family: rows for exported visits 10/20 must survive; visit 99
    // was never exported and must be filtered by the re-read key join
    val visitDefs = Seq((10, 1, "a"), (10, 2, "b"), (20, 1, "c"), (99, 1, "x"))
      .toDF("visit_id", "def_seq", "payload")
    val datastore = Seq(
      ("main", 0, "id-a2", "a2.fits#unzip=x"),
      ("cache", 1, "id-a2", "a2.fits"), // loses first-wins to main
      ("main", 0, "id-b1", "b1.fits"),
      ("main", 0, "id-c1", "c1.fits"),
      ("main", 0, "id-c2", "c1.fits") // same artifact, two refs
    ).toDF("datastore_name", "priority", "dataset_id", "path")

    Export.run(
      outDir = exportDir,
      types = Seq(
        Export.DatasetTypeInput("raw", "Exposure", refs, Seq("visit"), findFirst = true),
        Export.DatasetTypeInput("bias", "Calib", calibRefs, Seq("detector"), findFirst = false)),
      dimensions = Seq(Export.DimensionInput("visit", visits, Seq("visit"))),
      datastore = datastore,
      collections = collections,
      rootCollection = "root",
      expansions = Seq(
        // exercised: visit was exported -> visit_definition constrained to it
        Export.DimensionExpansion("visit", Seq("visit"),
          Export.DimensionInput("visit_definition", visitDefs,
            Seq("visit_id", "def_seq")),
          Seq("visit_id")),
        // skipped: source dimension never exported (export_dp1.py:120-121)
        Export.DimensionExpansion("detector", Seq("detector"),
          Export.DimensionInput("detector_extra", visitDefs, Seq("visit_id")),
          Seq("visit_id"))))

    // find_first: v2 beat v1 for visit 10; v1-only visit 20 survives
    val exported = spark.read.parquet(s"$exportDir/datasets/raw")
      .select("dataset_id").as[String].collect().toSet
    assert(exported == Set("id-a2", "id-b1"))
    // calibration: both validity ranges survive (no find_first)
    assert(spark.read.parquet(s"$exportDir/datasets/bias").count() == 2)
    // dimensions deduped
    assert(spark.read.parquet(s"$exportDir/dimensions/visit").count() == 2)
    // phase 2: visit_definition constrained to exported visit keys
    val defs = spark.read.parquet(s"$exportDir/dimensions/visit_definition")
      .select("visit_id", "def_seq").as[(Int, Int)].collect().toSet
    assert(defs == Set((10, 1), (10, 2), (20, 1))) // visit 99 filtered out
    // skipped expansion (source never exported) wrote nothing
    assert(!Files.exists(Paths.get(s"$exportDir/dimensions/detector_extra")))
    // datastore: first-wins kept `main` for id-a2, semi-joined to exported
    val ds = spark.read.parquet(s"$exportDir/datastore")
      .select("dataset_id", "datastore_name").as[(String, String)].collect().toMap
    assert(ds("id-a2") == "main" && ds.size == 4)
    // manifests
    val index = Manifests.readIndex(s"$exportDir/index.json")
    assert(index.dataset_types == Seq("raw", "bias") && index.root_collection == "root")
    // index lists the written expansion but not the skipped one
    assert(index.dimensions == Seq("visit", "visit_definition"))
    // reference-layout YAML manifest round-trips the chain
    assert(Manifests.readCollectionsYaml(s"$exportDir/collections.yaml")
      == collections)

    // ---- import
    val dimKeys = Map(
      "visit" -> Seq("visit"),
      "visit_definition" -> Seq("visit_id", "def_seq"))
    val dimDeps = Map(
      "visit" -> Nil,
      "visit_definition" -> Seq("visit"))
    val report = Import.run(spark, exportDir, targetDir,
      requestedTypes = Seq("raw", "bias"),
      dimensionKeys = dimKeys,
      dimensionDeps = dimDeps)
    // EVERY exported dimension imports, incl. the phase-2 expansion
    assert(report.dimensionsInserted ==
      Map("visit" -> 2L, "visit_definition" -> 3L))
    assert(report.datasetRows == Map("raw" -> 2L, "bias" -> 2L))
    assert(report.associated == 2L) // raw associations (TAGGED)
    assert(report.certified == 2L)  // calib associations carry timespans
    assert(Files.exists(Paths.get(s"$targetDir/datasets/raw")))
    assert(!Files.exists(Paths.get(s"$targetDir/.staging")))
    // dataset types are registered in the target (importer.py:43-48):
    // a target-side consumer can re-hydrate schemas from the catalog
    val registered = Manifests.readDatasetTypes(s"$targetDir/dataset_types.json")
    assert(registered.map(t => t.name -> t.dimensions).toMap ==
      Map("raw" -> Seq("visit"), "bias" -> Seq("detector")))

    // idempotent re-import: dimension insert count drops to zero
    val again = Import.run(spark, exportDir, targetDir,
      Seq("raw", "bias"), dimKeys, dimDeps)
    assert(again.dimensionsInserted ==
      Map("visit" -> 0L, "visit_definition" -> 0L))
    assert(spark.read.parquet(s"$targetDir/dimensions/visit").count() == 2)
    assert(spark.read.parquet(s"$targetDir/dimensions/visit_definition").count() == 3)

    // unknown requested type fails validation
    intercept[IllegalArgumentException] {
      Import.run(spark, exportDir, targetDir, Seq("nope"), dimKeys, dimDeps)
    }

    // an exported dimension the caller forgot to declare fails loudly
    // instead of being silently skipped (reference imports everything)
    val undeclared = intercept[IllegalArgumentException] {
      Import.run(spark, exportDir, mkTmp("graft-undeclared"), Seq("raw"),
        Map("visit" -> Seq("visit")), Map("visit" -> Nil))
    }
    assert(undeclared.getMessage.contains("visit_definition"))

    // a dataset parquet whose schema contradicts the registered type
    // fails before anything lands in the target
    val badExport = mkTmp("graft-badschema")
    copyTree(Paths.get(exportDir), Paths.get(badExport))
    Manifests.writeJson(s"$badExport/dataset_types.json", Seq(
      Manifests.DatasetTypeExport("raw", Seq("visit", "detector"), "Exposure"),
      Manifests.DatasetTypeExport("bias", Seq("detector"), "Calib")))
    val badTarget = mkTmp("graft-badtarget")
    val mismatch = intercept[IllegalArgumentException] {
      Import.run(spark, badExport, badTarget, Seq("raw", "bias"), dimKeys, dimDeps)
    }
    assert(mismatch.getMessage.contains("raw"))
    assert(!Files.exists(Paths.get(s"$badTarget/datasets")), "failed before any write")

    // datastore mapping function: names and path prefixes rewrite
    // before re-nesting (datastore_mapping.py:47-52)
    val mapped = mkTmp("graft-mapped")
    Import.run(spark, exportDir, mapped, Seq("raw", "bias"), dimKeys, dimDeps,
      datastoreRename = Map("main" -> "archive"),
      pathRemap = Seq("a2" -> "zone/a2", "a" -> "never-reached"))
    val flat = spark.read.parquet(s"$mapped/datastore")
      .select(col("datastore_name"), explode(col("file_infos")).as("fi"))
      .select("datastore_name", "fi.path")
      .as[(String, String)].collect()
    assert(flat.nonEmpty && flat.forall(_._1 == "archive")) // renamed
    // first matching prefix rule wins: a2 -> zone/a2, not the 'a' rule
    assert(flat.exists(_._2.startsWith("zone/a2")))
    assert(!flat.exists(_._2.contains("never-reached")))

    // ---- file tree
    val treeRoot = mkTmp("graft-tree")
    val plan = FileTree.plan(
      spark.read.parquet(s"$exportDir/datastore"), "path",
      sourceRoot = "/data/src", remap = Seq("a2" -> "zone/a2"))
    // c1.fits referenced by two refs -> one link after dedup
    assert(plan.count() == 3)
    FileTree.execute(plan, treeRoot)
    FileTree.execute(plan, treeRoot) // idempotent second run
    val a2 = Paths.get(treeRoot, "zone/a2.fits")
    assert(Files.isSymbolicLink(a2))
    // fragment stripped from the target
    assert(Files.readSymbolicLink(a2).toString == "/data/src/a2.fits")
  }

  test("staged-promote crash safety: mid-stage failure leaves the target intact; re-run completes") {
    // The documented weaker-than-ACID guarantee (Import.scala staging
    // contract) exercised for real: a failure AFTER several staging
    // writes but BEFORE promote must leave the previously-imported
    // target untouched, and a corrected re-run must complete
    // idempotently over the leftover staging dir. The injected crash
    // is genuine, not a test seam — the datastore path mapper's
    // absolute-path guard (mappedPath raise_error, mirroring
    // import_dp1.py:92-97) fires inside the LAST staging write, after
    // dimensions/datasets/associations are already staged.
    val exportDir = mkTmp("graft-crash-export")
    val targetDir = mkTmp("graft-crash-target")
    val refs = Seq(("id-a", "runs/v1", "runs/v1", 10),
      ("id-b", "runs/v1", "runs/v1", 20)).toDF("dataset_id", "run", "collection", "visit")
    val visits = Seq((10, "r"), (20, "g")).toDF("visit", "band")
    val datastore = Seq(("main", 0, "id-a", "s3://bucket/a.fits"),
      ("main", 0, "id-b", "s3://bucket/b.fits"))
      .toDF("datastore_name", "priority", "dataset_id", "path")
    Export.run(exportDir,
      types = Seq(Export.DatasetTypeInput("raw", "Exp", refs, Seq("visit"),
        findFirst = true)),
      dimensions = Seq(Export.DimensionInput("visit", visits, Seq("visit"))),
      datastore = datastore,
      collections = Seq(
        CollectionExport("root", "CHAINED", Seq("runs/v1")),
        CollectionExport("runs/v1", "TAGGED", Nil)),
      rootCollection = "root")
    val dimKeys = Map("visit" -> Seq("visit"))
    val dimDeps = Map("visit" -> Seq.empty[String])
    val goodRemap = Seq("s3://bucket/" -> "local/")

    // successful first import establishes the "previous target" state
    Import.run(spark, exportDir, targetDir, Seq("raw"), dimKeys, dimDeps,
      pathRemap = goodRemap)
    def targetState() = (
      spark.read.parquet(s"$targetDir/datasets/raw")
        .select("dataset_id").as[String].collect().toSet,
      spark.read.parquet(s"$targetDir/dimensions/visit").count(),
      spark.read.parquet(s"$targetDir/datastore").count())
    val before = targetState()
    assert(before._1 == Set("id-a", "id-b"))

    // crash: the remap rules miss the s3 prefix, so paths stay
    // absolute and the guard throws mid-staging (before promote)
    val e = intercept[Exception] {
      Import.run(spark, exportDir, targetDir, Seq("raw"), dimKeys, dimDeps,
        pathRemap = Seq("file://" -> "never/"))
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(messages.contains("Unhandled absolute path"),
      s"unexpected failure: $messages")
    // previous target state is untouched — promote never ran
    assert(targetState() == before)
    // the crash leaves an inert staging dir behind (never promoted)
    assert(Files.exists(Paths.get(s"$targetDir/.staging")))

    // corrected re-run completes idempotently over the leftover staging:
    // dimension inserts drop to zero (anti-join skip-existing), staging
    // is promoted and removed
    val again = Import.run(spark, exportDir, targetDir, Seq("raw"),
      dimKeys, dimDeps, pathRemap = goodRemap)
    assert(again.dimensionsInserted == Map("visit" -> 0L))
    assert(!Files.exists(Paths.get(s"$targetDir/.staging")))
    assert(targetState() == before)
  }

  test("sequential imports of different types accumulate: a second import " +
      "never deletes a prior import's tables") {
    // The accumulating-catalog contract applied to the DATA: import
    // export A (type 'raw', dim 'visit'), then export B (type 'bias',
    // dim 'detector') into the SAME target — A's dataset table,
    // dimension table, associations, and datastore records must all
    // survive B's promote (a family-wholesale replace would delete
    // them while dataset_types.json still lists 'raw').
    val exportA = mkTmp("graft-multi-a")
    val exportB = mkTmp("graft-multi-b")
    val targetDir = mkTmp("graft-multi-target")
    val refsA = Seq(("id-a", "runs/v1", "runs/v1", 10))
      .toDF("dataset_id", "run", "collection", "visit")
    val visits = Seq((10, "r")).toDF("visit", "band")
    val dsA = Seq(("main", 0, "id-a", "s3://bucket/a.fits"))
      .toDF("datastore_name", "priority", "dataset_id", "path")
    Export.run(exportA,
      types = Seq(Export.DatasetTypeInput("raw", "Exp", refsA, Seq("visit"),
        findFirst = true)),
      dimensions = Seq(Export.DimensionInput("visit", visits, Seq("visit"))),
      datastore = dsA,
      collections = Seq(
        CollectionExport("root", "CHAINED", Seq("runs/v1")),
        CollectionExport("runs/v1", "TAGGED", Nil)),
      rootCollection = "root")
    val refsB = Seq(("id-b", "runs/v2", "runs/v2", 7))
      .toDF("dataset_id", "run", "collection", "detector")
    val detectors = Seq((7, "itl")).toDF("detector", "vendor")
    val dsB = Seq(("main", 0, "id-b", "s3://bucket/b.fits"))
      .toDF("datastore_name", "priority", "dataset_id", "path")
    Export.run(exportB,
      types = Seq(Export.DatasetTypeInput("bias", "Exp", refsB,
        Seq("detector"), findFirst = true)),
      dimensions = Seq(
        Export.DimensionInput("detector", detectors, Seq("detector"))),
      datastore = dsB,
      collections = Seq(
        CollectionExport("root", "CHAINED", Seq("runs/v2")),
        CollectionExport("runs/v2", "TAGGED", Nil)),
      rootCollection = "root")
    val remap = Seq("s3://bucket/" -> "local/")
    Import.run(spark, exportA, targetDir, Seq("raw"),
      Map("visit" -> Seq("visit")), Map("visit" -> Nil), pathRemap = remap)
    Import.run(spark, exportB, targetDir, Seq("bias"),
      Map("detector" -> Seq("detector")), Map("detector" -> Nil),
      pathRemap = remap)
    // A's tables all survived B's promote
    assert(spark.read.parquet(s"$targetDir/datasets/raw")
      .select("dataset_id").as[String].collect().toSeq == Seq("id-a"))
    assert(spark.read.parquet(s"$targetDir/datasets/bias")
      .select("dataset_id").as[String].collect().toSeq == Seq("id-b"))
    assert(spark.read.parquet(s"$targetDir/dimensions/visit").count() == 1L)
    assert(spark.read.parquet(s"$targetDir/dimensions/detector").count() == 1L)
    assert(spark.read.parquet(s"$targetDir/associations_tagged")
      .select("dataset_id").as[String].collect().toSet == Set("id-a", "id-b"))
    assert(spark.read.parquet(s"$targetDir/datastore")
      .select("dataset_id").as[String].collect().toSet == Set("id-a", "id-b"))
    // and the catalog lists both types, consistent with the data
    val types = graft.model.Manifests
      .readDatasetTypes(s"$targetDir/dataset_types.json").map(_.name).toSet
    assert(types == Set("raw", "bias"))
    // re-import of A stays idempotent under the merge semantics
    val again = Import.run(spark, exportA, targetDir, Seq("raw"),
      Map("visit" -> Seq("visit")), Map("visit" -> Nil), pathRemap = remap)
    assert(again.dimensionsInserted == Map("visit" -> 0L))
    assert(spark.read.parquet(s"$targetDir/associations_tagged").count() == 2L)
    assert(spark.read.parquet(s"$targetDir/datastore").count() == 2L)
  }
}
