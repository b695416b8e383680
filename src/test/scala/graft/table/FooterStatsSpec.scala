package graft.table

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Pins the footer-derived write statistics (round 11's stage() path):
  * footer bounds must equal a full rescan's, all-NULL columns must
  * report nothing, byte ordering must match parquet's, and — the
  * round-12 advisor fix — a row group whose binary stats parquet-mr
  * OMITTED (values past MAX_STATS_SIZE, 4 KB) must invalidate the
  * column's file-level bounds instead of silently narrowing them. */
class FooterStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def onlyFile(dir: String): String =
    new java.io.File(dir).listFiles.toSeq
      .filter(_.getName.startsWith("part-")).map(_.getPath).sorted.head

  test("footer stats equal a full rescan (ints, strings, nulls, all-NULL)") {
    val dir = graft.util.Scratch.dir("graft-fstats-eq") + "/t"
    val df = (1L to 500L).map { k =>
      (k, if (k % 7 == 0) null else s"v$k",
       if (k % 3 == 0) null else java.lang.Long.valueOf(k * 2),
       null.asInstanceOf[String])
    }.toDF("k", "s", "n", "dead")
    df.coalesce(1).write.parquet(dir)
    val f = onlyFile(dir)
    val st = FooterStats.read(f, Set("k", "n"), Set("s", "dead"))
    assert(st.rows == 500L)
    // footer bounds ≡ rescanned bounds, column for column
    val re = spark.read.parquet(f)
      .agg(min("k"), max("k"), min("n"), max("n"), min("s"), max("s")).head
    assert(st.intStats("k") == ((re.getLong(0), re.getLong(1))))
    assert(st.intStats("n") == ((re.getLong(2), re.getLong(3))))
    assert(st.strStats("s") == ((re.getString(4), re.getString(5))))
    // an all-NULL column reports NO bounds (always a candidate)
    assert(!st.strStats.contains("dead"))
    assert(FooterStats.rowCount(f) == 500L)
  }

  test("byteCompare is unsigned-UTF-8 order, not String.compareTo") {
    val supp = new String(Character.toChars(0x1F600)) // U+1F600, 4-byte UTF-8
    val bmp = "\uFFFD"                       // U+FFFD, 3-byte UTF-8
    // UTF-16 surrogates order supp BELOW bmp; UTF-8 bytes order it ABOVE
    assert(supp.compareTo(bmp) < 0)
    assert(FooterStats.byteCompare(supp, bmp) > 0)
    assert(FooterStats.byteCompare("a", "b") < 0)
    assert(FooterStats.byteCompare("ab", "a") > 0)
    assert(FooterStats.byteCompare("same", "same") == 0)
  }

  test("an omitted-stats row group invalidates the column's bounds (advisor)") {
    // parquet-mr drops binary min/max from the footer when a value
    // exceeds MAX_STATS_SIZE (4 KB). Lay the file out so EARLY row
    // groups have clean small-string stats and a LATE group holds a
    // 5 KB value: merging only the groups that have stats would mint
    // bounds that EXCLUDE the big value, and a planner pruning off
    // them would silently miss rows.
    val big = "Z" * 5000
    val dir = graft.util.Scratch.dir("graft-fstats-omit") + "/t"
    val df = ((1L to 400L).map(k => (f"x$k%04d", k)) :+ ((big, 401L)))
      .toDF("id", "n")
    df.coalesce(1).write
      .option("parquet.block.size", "2048") // force several row groups
      .parquet(dir)
    val f = onlyFile(dir)
    // fixture self-check: several groups, and at least one id chunk
    // with rows but no usable stats (the omission really happened)
    import scala.jdk.CollectionConverters._
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f),
        new org.apache.hadoop.conf.Configuration()))
    val blocks = try r.getFooter.getBlocks.asScala.toSeq finally r.close()
    assert(blocks.size >= 2, s"fixture needs several row groups (got ${blocks.size})")
    val omitted = blocks.exists { b =>
      b.getColumns.asScala.exists { c =>
        c.getPath.toArray.toSeq == Seq("id") && {
          val st = c.getStatistics
          st == null || st.isEmpty || !st.hasNonNullValue
        }
      }
    }
    assert(omitted, "fixture: parquet-mr must have omitted the 5 KB value's stats")
    // the contract: report NO id bounds at all (unbounded ⇒ always a
    // candidate) — never bounds that exclude the big value
    val st = FooterStats.read(f, Set("n"), Set("id"))
    st.strStats.get("id").foreach { case (lo, hi) =>
      assert(FooterStats.byteCompare(lo, big) <= 0 &&
             FooterStats.byteCompare(big, hi) <= 0,
        s"bounds [$lo, $hi] exclude a real value — unsound")
    }
    assert(!st.strStats.contains("id"),
      "an omitted-stats group must invalidate the column's bounds")
    // the int column's stats are independent and stay exact
    assert(st.intStats("n") == ((1L, 401L)))
    assert(st.rows == 401L)
  }
}
