package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** The PLANS.md staleness guard: the plan audit is the scale-honesty
  * artifact, and it shipped one batch behind the registry two rounds
  * running (x94–x98 in r8, x131–x136 in r9) because nothing failed when a
  * query registered without a plan row. This spec makes that structurally
  * impossible — `sbt test` goes red the moment the registered query set
  * and PLANS.md's row set diverge, in either direction. Regenerate with:
  *
  *   sbt "runMain graft.PlanAudit /root/testdata/sf0.1 PLANS.md"
  *
  * (Deliberately a plain FunSuite — no SparkSession; parsing a committed
  * artifact must not cost a JVM-wide Spark startup.)
  */
class PlanAuditGuardSpec extends AnyFunSuite {

  private def planRows: Set[String] = {
    val p = Paths.get("PLANS.md")
    assert(Files.exists(p), "PLANS.md must be committed at the repo root")
    Files.readAllLines(p).asScala.iterator
      .map(_.trim)
      .filter(l => l.startsWith("| ") && !l.startsWith("| query") && !l.startsWith("|---"))
      .map(_.stripPrefix("|").split('|').head.trim)
      .filter(_.nonEmpty)
      .toSet
  }

  test("every registered query has a PLANS.md row and every row names a registered query") {
    val registered = SparkEntry.queries.keySet
    val rows = planRows
    val missing = (registered -- rows).toSeq.sorted
    val stale = (rows -- registered).toSeq.sorted
    assert(missing.isEmpty,
      s"queries registered without a plan row (regenerate PLANS.md): ${missing.mkString(", ")}")
    assert(stale.isEmpty,
      s"PLANS.md rows for unregistered queries (regenerate PLANS.md): ${stale.mkString(", ")}")
  }
}
