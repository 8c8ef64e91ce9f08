package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness (not part of the library surface): times each
  * named query from [[SparkEntry.queries]] given on the command line, or
  * explains it with `--explain`. Fixture dir comes from SPARK_GRAFT_SF_DIR.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.Scratch doc_ngram_jaccard doc_dup_clusters"
  * sbt "runMain graft.Scratch --explain q_bloom_semijoin"
  * }}}
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val explain = args.contains("--explain")
    val names = args.filterNot(_.startsWith("--")) match {
      case Array() => Array("q1_pricing")
      case a => a
    }
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      if (explain) {
        println(s"##### $name")
        fn(spark, sfDir).explain("formatted")
      } else {
        // three repetitions: cold (cache fill) vs warm separate cleanly
        for (i <- 1 to 3) {
          val sp0 = graft.cdc.Materialize.Spans.snapshot()
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          println(f"[scratch] $name%-28s #$i ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
          if (args.contains("--spans")) {
            val sp1 = graft.cdc.Materialize.Spans.snapshot()
            sp1.toSeq.map { case (k, (sec, c)) =>
                val (s0, c0) = sp0.getOrElse(k, (0.0, 0L))
                (k, sec - s0, c - c0)
              }
              .filter(_._2 >= 0.05).sortBy(-_._2)
              .foreach { case (k, sec, c) =>
                println(f"[scratch]   span $k%-28s $sec%7.3f s  n=$c") }
          }
        }
      }
    }
    spark.stop()
  }
}
