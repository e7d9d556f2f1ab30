package graft.tools

import graft.{Engine, Registry}

/** Plan inspection: `runMain graft.tools.Explain <sfDir> <query...>` prints
  * each query's formatted physical plan — the review loop for pushdown,
  * broadcast choice, codegen spans, and shuffle counts.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Registry.all.map(_.name)
    val spark = Engine.session("local[4]", "graft-explain", 4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try Registry.byName(n).fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
