package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft-warehouse-${java.util.UUID.randomUUID()}")
    // same optimizer config as the Bench/Verify/Plans sessions (r18
    // ADVICE): plan-shape assertions (PlanPropertiesSpec) and operator
    // tests must exercise the configuration that is benched and shipped
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
      "true")
    .getOrCreate()
}
