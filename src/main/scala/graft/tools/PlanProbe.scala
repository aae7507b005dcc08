package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch: print AQE-final plans of named entries for shuffle audits.
  * Usage: runMain graft.tools.PlanProbe <sfDir> <name> [name...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      println(s"==== $name ====")
      println(s.split("== Initial Plan ==")(0))
    }
    spark.stop()
  }
}
