package graft

import org.apache.spark.sql.functions._

/** Sabotage test for the correctness-dump harness: a query that throws
  * must land in the returned error map AND in errors.json (so the driver
  * can't read a shrunken dump as all-green — the r9 failure mode), while
  * the healthy queries' parquet dumps still get written. `main` turns a
  * nonempty map into exit 1; the spec exercises the map contract (calling
  * `sys.exit` in-suite would kill the sbt JVM).
  */
class VerifySabotageSpec extends SparkSpec {

  test("a throwing query lands in errors.json; good dumps still written") {
    val out = java.nio.file.Files.createTempDirectory("verify_sabotage").toString
    val errors = Verify.run(spark, sf, out, Set.empty,
      Map(
        "good_probe" -> ((s, d) =>
          s.read.parquet(s"$d/region.parquet").select(col("r_regionkey"))),
        "bad_probe" -> ((s, _) =>
          s.range(1).selectExpr("assert_true(id > 0, 'sabotage') AS boom"))),
      Map("good_probe" -> "SELECT r_regionkey FROM region"))
    assert(errors.keySet === Set("bad_probe"))
    assert(errors("bad_probe").nonEmpty)
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errJson.contains("bad_probe"), errJson)
    // the failure must not take healthy dumps down with it
    assert(new java.io.File(s"$out/good_probe").exists)
    assert(spark.read.parquet(s"$out/good_probe").count() > 0)
    val oracle = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"))
    assert(oracle.contains("good_probe"))
  }
}
