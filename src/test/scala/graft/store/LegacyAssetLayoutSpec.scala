package graft.store

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Pins the round-16 layout migration: round 15 moved asset BYTES from
  * `$base/assets` (shared with the assets TABLE directory) to the
  * disjoint `$base/asset_files`, which left any pre-existing store's
  * byte tree invisible at the new root — redelivery re-copies under
  * `asset_files/` while the orphans keep inflating the table's parquet
  * listing, the exact problem the split targeted. Store open now adopts
  * the legacy tree (LocalStore.adoptLegacyAssetBytes). */
class LegacyAssetLayoutSpec extends SparkSpec {

  test("store open adopts a legacy byte tree out of the assets table dir") {
    val base = Files.createTempDirectory("graft-legacy-store").toString
    val tableDir = Paths.get(base, "assets")
    Files.createDirectories(tableDir)
    // table artifacts (files + Spark markers) must stay put
    Files.writeString(tableDir.resolve("part-00000.parquet"), "table bytes")
    Files.writeString(tableDir.resolve("_SUCCESS"), "")
    Files.createDirectories(tableDir.resolve("_temporary"))
    // legacy byte tree: <uri>/<dest_filename> with a multi-segment uri
    val legacy = tableDir.resolve("ewca/civ/2022/111")
    Files.createDirectories(legacy)
    Files.writeString(legacy.resolve("doc.docx"), "legacy bytes")
    Files.writeString(legacy.resolve("parser.log"), "stale")
    // the same key ALREADY re-copied under the new root: the fresh copy
    // wins (reference overwrites the same keys on redelivery)
    val reCopied = Paths.get(base, "asset_files/ewca/civ/2022/111")
    Files.createDirectories(reCopied)
    Files.writeString(reCopied.resolve("parser.log"), "fresh")

    val store = LocalStore(spark, base)
    val root = Paths.get(store.assetRoot)
    assert(Files.readString(root.resolve("ewca/civ/2022/111/doc.docx")) == "legacy bytes",
      "a byte only present under the legacy root must move to the new root")
    assert(Files.readString(root.resolve("ewca/civ/2022/111/parser.log")) == "fresh",
      "a byte already re-copied under the new root must win over its legacy copy")
    assert(!Files.exists(tableDir.resolve("ewca")),
      "the legacy tree must leave the table directory (its listing pollution is the bug)")
    assert(Files.exists(tableDir.resolve("part-00000.parquet"))
      && Files.exists(tableDir.resolve("_SUCCESS"))
      && Files.isDirectory(tableDir.resolve("_temporary")),
      "table files and Spark artifacts must be untouched")

    // reopening is a no-op: nothing legacy remains
    LocalStore(spark, base)
    assert(Files.readString(root.resolve("ewca/civ/2022/111/doc.docx")) == "legacy bytes")
  }

  test("a store with no assets table at all opens clean") {
    val base = Files.createTempDirectory("graft-legacy-store2").toString
    val store = LocalStore(spark, base)
    assert(!Files.exists(Paths.get(base, "assets")))
    assert(store.read("assets").isEmpty)
  }
}
