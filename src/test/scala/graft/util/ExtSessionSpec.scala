package graft.util

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The extensions-session derivation (ExtSession): the derived
  * session shares the caller's SparkContext, carries the injected
  * extensions, and mirrors the caller's catalog definitions on every
  * access — a catalog registered on the caller AFTER the first
  * derivation still resolves through the derived session (the
  * round-16 advisor's conf-carryover gap). */
class ExtSessionSpec extends AnyFunSuite {

  test("derivation shares the context and is cached") {
    val base = SparkTestSession.spark
    val d1 = ExtSession(base)
    val d2 = ExtSession(base)
    assert(d1 eq d2, "repeated derivations must return the cache")
    assert(d1.sparkContext eq base.sparkContext)
    assert(d1 ne base)
    // the caller's active/default registration is restored
    assert(org.apache.spark.sql.SparkSession.active eq base)
  }

  test("catalog definitions mirror onto the derived session on access") {
    val base = SparkTestSession.spark
    ExtSession(base) // warm the cache first — mirroring must still work
    val wh = graft.util.Scratch.dir("graft-extsess-wh")
    base.conf.set("spark.sql.catalog.extsess_t",
      classOf[graft.sources.GraftCatalog].getName)
    base.conf.set("spark.sql.catalog.extsess_t.warehouse", wh)
    val derived = ExtSession(base)
    assert(derived.conf.get("spark.sql.catalog.extsess_t.warehouse")
      == wh, "a catalog registered on the caller post-derivation " +
        "must resolve through the derived session")
    // ...and it actually RESOLVES: DDL through the derived session
    derived.sql("CREATE TABLE extsess_t.m (k BIGINT) " +
      "TBLPROPERTIES ('key' = 'k')")
    derived.sql("INSERT INTO extsess_t.m VALUES (1)")
    assert(derived.table("extsess_t.m").count() == 1)
    // existing keys never overwrite: a deliberate re-point on the
    // derived session survives later mirrors
    derived.conf.set("spark.sql.catalog.extsess_t.warehouse",
      wh + "-repointed")
    base.conf.set("spark.sql.catalog.extsess_t.warehouse", wh)
    assert(ExtSession(base)
      .conf.get("spark.sql.catalog.extsess_t.warehouse")
      == wh + "-repointed")
  }

  test("semantics confs mirror on every access (round-17 advisor)") {
    val base = SparkTestSession.spark
    ExtSession(base) // warm the cache — post-derivation flips must land
    val tz0 = base.conf.get("spark.sql.session.timeZone")
    val cs0 = base.conf.get("spark.sql.caseSensitive")
    try {
      base.conf.set("spark.sql.session.timeZone", "America/New_York")
      base.conf.set("spark.sql.caseSensitive", "true")
      val derived = ExtSession(base)
      assert(derived.conf.get("spark.sql.session.timeZone")
        == "America/New_York",
        "a timezone flipped on the caller after derivation must " +
          "govern SQL run through the derived session")
      assert(derived.conf.get("spark.sql.caseSensitive") == "true")
      // ...and flipping BACK mirrors too (overwrite-on-divergence,
      // unlike the catalog keys' never-overwrite)
      base.conf.set("spark.sql.caseSensitive", "false")
      assert(ExtSession(base).conf.get("spark.sql.caseSensitive")
        == "false")
    } finally {
      base.conf.set("spark.sql.session.timeZone", tz0)
      base.conf.set("spark.sql.caseSensitive", cs0)
      ExtSession(base) // re-mirror the restored values
    }
  }
}
