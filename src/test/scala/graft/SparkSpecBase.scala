package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (sf0.001 data; 4 cores). */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // session is shared across suites in one JVM — do not stop it here,
    // but DO release any HotCache slot registrations this suite's builds
    // made (d09/p06b), so no cached plan leaks into later suites
    graft.operators.HotCache.releaseAll()
    super.afterAll()
  }

  def run(name: String, dir: String = sf) =
    SparkEntry.queries(name)(spark, dir)
}
