package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic probe (re-run when upgrading Spark): does an Observation
  * attached below a localCheckpoint(eager=true) / checkpoint(eager=true)
  * materialization fire, so an iterative loop can read its convergence
  * aggregate from the SAME job that pins the round's result? Prints
  * FIRED/TIMEOUT. connectedComponentsDistributed's Observation-fused
  * convergence witness relies on both answers being FIRED; its 30 s
  * fallback aggregate covers a future Spark that changes the behavior,
  * and THIS probe is how to check a new version directly. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ckptDir = java.nio.file.Files.createTempDirectory("obsprobe-ckpt")
    val obs = Observation("probe")
    val df = spark.range(1000).toDF("id")
      .observe(obs, sum(col("id")).cast("decimal(38,0)").as("s"))
    val cp = df.localCheckpoint(true)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val got =
      try Some(Await.result(Future(obs.get), 5.seconds))
      catch { case _: java.util.concurrent.TimeoutException => None }
    println(s"PROBE localCheckpoint: ${got.map("FIRED " + _("s")).getOrElse("TIMEOUT")}")
    println(s"cp count: ${cp.count()}")
    // the reliable path: persist -> Dataset.checkpoint(eager) -> unpersist
    // (Checkpoints.reliable's exact shape)
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    val obs2 = Observation("probe2")
    val df2 = spark.range(2000).toDF("id")
      .observe(obs2, sum(col("id")).cast("decimal(38,0)").as("s"))
    val cached = df2.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cp2 = cached.checkpoint(true)
    cached.unpersist()
    val got2 =
      try Some(Await.result(Future(obs2.get), 5.seconds))
      catch { case _: java.util.concurrent.TimeoutException => None }
    println(s"PROBE reliable checkpoint: ${got2.map("FIRED " + _("s")).getOrElse("TIMEOUT")}")
    println(s"cp2 count: ${cp2.count()}")
    spark.stop()
    // probe leaves no checkpoint litter behind
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(ckptDir).iterator().asScala.toSeq.reverse
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
