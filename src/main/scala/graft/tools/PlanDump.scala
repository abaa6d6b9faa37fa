package graft.tools
import graft._
import org.apache.spark.sql.functions._
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val d = "/root/testdata/sf0.1"
    val sig = ext.Dedup.minhashSignatures(Tables.documents(spark, d))
    println("=== minhash optimized ===")
    println(sig.queryExecution.optimizedPlan.toString.take(3000))
    println("=== partitions: " + sig.rdd.getNumPartitions)
    val sh = ext.Dedup.simhash(Tables.documents(spark, d))
    println("=== simhash optimized ===")
    println(sh.queryExecution.optimizedPlan.toString.take(2000))
    spark.stop()
  }
}
