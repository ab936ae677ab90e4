package graft.tools

import org.apache.spark.sql.SparkSession

import graft.functions.TiktokenEncoding
import graft.textops.ByteBpe

/** Freeze a `.tiktoken` mergeable-ranks file from a corpus — the tool
  * that produced the bundled `graft/frozen_corpus.tiktoken` resource
  * (the deployment-default vocabulary behind
  * [[TiktokenEncoding.frozen]]). Re-run it against a real corpus (or
  * swap in the published o200k/cl100k file) to upgrade the vocabulary
  * without touching code.
  *
  * Usage: runMain graft.tools.FreezeRanks [sfDir] [outPath] [numMerges]
  */
object FreezeRanks {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outPath = if (args.length > 1) args(1)
      else "src/main/resources/graft/frozen_corpus.tiktoken"
    val numMerges = if (args.length > 2) args(2).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outPath).getParentFile.mkdirs()
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val achieved = ByteBpe.freeze(
      docs, "text", TiktokenEncoding.Cl100kPattern, numMerges, outPath)
    println(s"[freeze-ranks] wrote $outPath: ${256 + achieved} tokens " +
      s"($achieved merges; corpus saturates below $numMerges when diversity runs out)")
    spark.stop()
  }
}
