package graft

import java.nio.file.Files

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("scratch").master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // library-consumer walkthrough: encode frames -> replay -> typed view -> apply
    import graft.wal.{FrameFile, PgOutput, PgOutputEncoder => E}
    val rel = PgOutput.RelationMeta(9, "public", "t", Vector(
      PgOutput.RelationColumn("id", 20, -1, 0),
      PgOutput.RelationColumn("v", 1700, ((10 << 16) | 2) + 4, 0)))
    val frames = Seq(
      E.relation(rel), E.begin(),
      E.insert(9, Seq(Some("1"), Some("3.50"))),
      E.insert(9, Seq(Some("2"), None)),
      E.commit(), E.begin(),
      E.update(9, Seq(Some("1"), Some("7.25"))),
      E.delete(9, Seq(Some("2"), None)),
      E.commit())
    val dir = Files.createTempDirectory("scratch")
    val path = dir.resolve("w.frames").toString
    FrameFile.write(path, frames.zipWithIndex.map { case (f, i) => (i.toLong, f) })

    val env = graft.sources.ReplayDecode.batchDf(spark, path)
    println("--- envelope:"); env.show(10, truncate = false)
    val typed = graft.cdc.Envelope.typedView(env, rel)
    println("--- typed:"); typed.show(10)
    import spark.implicits._
    val current = Seq((5L, new java.math.BigDecimal("1.00"))).toDF("id", "v")
      .select($"id", $"v".cast("decimal(10,2)").as("v"))
    val state = graft.cdc.Envelope.applyChanges(current, typed, Seq("id"))
    println("--- applied state:"); state.orderBy("id").show()

    // streaming through the registered short name
    val ckpt = dir.resolve("ckpt").toString
    val q = spark.readStream.format("pgcdc-replay")
      .option("path", path).option("maxFramesPerTrigger", 4).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        println(s"--- stream batch $id: ${df.count()} rows"); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    spark.stop()
  }
}
