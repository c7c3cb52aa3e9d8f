package graft.sql

import graft.SparkSpec

/** q106's layout lesson, pinned: linear sort cannot prune the trailing
  * dimension (every file spans all of d2), the balanced Z-curve bounds
  * both dims per file. */
class ZorderSpec extends SparkSpec {

  test("zorder prunes the trailing dimension, linear reads every file") {
    val rows = RelationalQueries.q106ZorderLayout(spark, Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val (ln, ld1, ld2, lboth) = rows("linear")
    val (zn, zd1, zd2, zboth) = rows("zorder")
    assert(ln == 64 && zn == 64)
    assert(ld2 == ln, s"linear must read EVERY file for a trailing-dim box, got $ld2/$ln")
    assert(zd2 < ld2, s"zorder must prune the trailing-dim box: $zd2 vs $ld2")
    assert(zboth <= lboth, s"zorder point-box must not be worse: $zboth vs $lboth")
    assert(ld1 <= zd1, s"leading-dim box is linear's home game: $ld1 vs $zd1")
  }
}
