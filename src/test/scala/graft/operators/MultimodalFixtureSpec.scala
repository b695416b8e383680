package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** m03's oracle equivalence is structural ONLY under an ASCII corpus:
  * the Scala side MD5s a BYTE-slice of the payload while the DuckDB
  * oracle MD5s a CHARACTER substring of the text (DuckDB cannot slice
  * blobs), so any multibyte UTF-8 document would silently diverge the
  * two. This spec pins the invariant on every fixture SF the gate and
  * unit tests read — if a future fixture ships non-ASCII text, it fails
  * HERE with a named cause instead of as an opaque m03 hash mismatch
  * (round-5 advisor). */
class MultimodalFixtureSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"documents.text is pure ASCII at $dir (m03 byte≡char slicing)") {
      // one job: collect the first offenders, assert on emptiness (an
      // assert clue is by-value — interpolating a .head() there ran a
      // second scan even on green runs)
      val offenders = graft.Tables.documents(spark, dir)
        .where(length(col("text")) =!=
               octet_length(encode(col("text"), "UTF-8")))
        .select("doc_id").head(5)
      assert(offenders.isEmpty,
        s"non-ASCII documents break m03's byte-slice/char-substring oracle " +
          s"equivalence: ${offenders.mkString(",")}")
    }
  }
}
