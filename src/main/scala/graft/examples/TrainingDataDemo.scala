package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.textops.CurationOps

/** The training-data side of the house composed end to end — the twin
  * of [[CrawlPlannerDemo]] (which feeds it): raw fetched docs →
  * keep-best dedup (q172) → cluster-safe splitting (q173) →
  * digest-derived length floor (q175) → tokenizer-fertility panel →
  * fertility-aware curriculum mix schedule (q170) → span-corruption
  * denoising pairs (q171) → deterministic train order (q82). Run:
  * `sbt "runMain graft.examples.TrainingDataDemo"`.
  *
  * Every stage is the gated operator itself — this file only composes
  * — and every handoff is a DataFrame, so the whole chain is one lazy
  * plan per action at any corpus size.
  */
object TrainingDataDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-training-data")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir, "documents")

    // 1. keep-best dedup: a re-fetched upper-cased variant of every
    // third doc must lose to itself — the survivor set keeps the
    // longest raw bytes per normalized key
    val variants = docs.filter($"doc_id" % 3 === 0).select(
      ($"doc_id" + 100000L).as("doc_id"), concat($"text", lit(" !!")).as("text"),
      $"lang", $"source", (length($"text") + 3).cast("long").as("n_chars"))
    val all = docs.select($"doc_id", $"text", $"lang", $"source",
      $"n_chars".cast("long").as("n_chars")).unionByName(variants)
      .withColumn("q", length($"text").cast("long"))
    val flags = CurationOps.dedupKeepBest(all, "doc_id", "text", "q")
    val survivors = all.join(
      flags.filter($"kept" === 1).select($"doc_id"), "doc_id")
    println(s"[demo] keep-best: ${all.count()} candidates -> " +
      s"${survivors.count()} survivors")

    // 2. cluster-safe split: near-dup clusters (MinHash-LSH → CC)
    // hash as ONE unit into 80/10/10
    val pairs = graft.textops.NearDup.minhashLshPairs(
      survivors, "doc_id", "text", n = 3, bands = 16, rowsPerBand = 4,
      threshold = 0.5)
    val clusters = graft.graph.ConnectedComponents.dedupClusters(
      pairs, "id_a", "id_b")
    val split = CurationOps.clusterSafeSplit(survivors, "doc_id",
      clusters, "doc_id", "cluster_id", salt = "demo", trainPct = 80,
      validPct = 10)
    println("[demo] split sizes: " + split.groupBy($"split").count()
      .orderBy($"split").collect().map(r => s"${r.get(0)}=${r.get(1)}")
      .mkString(" "))

    // 3. digest-derived length floor on the train side (the q175 law:
    // p10 of the word-count digest, never hand-tuned)
    val train = survivors.join(
      split.filter($"split" === "train").select($"doc_id"), "doc_id")
    val wc = graft.textops.TextAnalysis.wordCountCol($"text")
    val floorValue = graft.sketch.QDigest.quantilesTable(
        train, wc, logU = 12, k = 32, twentieths = Seq(2))
      .select($"value").as[Long].head()
    val admitted = train.filter(wc >= floorValue)
    println(s"[demo] length floor p10=$floorValue words: " +
      s"${train.count()} train docs -> ${admitted.count()} admitted")

    // 4. fertility panel under the frozen deployment vocabulary — the
    // signal that corrects token budgets per language
    val fert = CurationOps.tokenizerFertility(admitted, "lang", "text",
      graft.functions.TiktokenEncoding.frozen)
    println("[demo] fertility (tokens per kword) by lang:")
    fert.orderBy($"lang").collect().foreach(r =>
      println(s"[demo]   ${r.getAs[String]("lang")}: " +
        s"${r.getAs[Long]("tokens_per_kword")}"))

    // 5. curriculum mix schedule: anneal from char-mass to
    // token-count weights over 5 steps, 1000 rows per step
    val srcs = admitted.groupBy($"source")
      .agg(sum($"n_chars").as("w0"), count(lit(1)).as("w1"))
    val sched = CurationOps.mixSchedule(srcs, "source", "w0", "w1",
      steps = 5, budget = 1000L)
    println(s"[demo] mix schedule: ${sched.count()} (step, source) quotas, " +
      s"per-step sum = ${sched.filter($"step" === 1).agg(sum($"quota")).as[Long].head()}")

    // 6. span-corruption denoising pairs over the admitted train docs
    val sc = CurationOps.spanCorruption(admitted, "doc_id", "text", salt = "demo")
    val stats = sc.agg(sum($"n_masked"), sum($"n_words")).as[(Long, Long)].head()
    println(f"[demo] span corruption: ${stats._1} of ${stats._2} words masked " +
      f"(${stats._1 * 100.0 / stats._2}%.1f%%)")

    // 7. deterministic train order + shards — the writer's final step
    val order = CurationOps.trainOrder(admitted, "doc_id", seed = "epoch0",
      shards = 4)
    println("[demo] train order: " + order.groupBy($"shard").count()
      .orderBy($"shard").collect().map(r => s"shard${r.get(0)}=${r.get(1)}")
      .mkString(" "))
    spark.stop()
  }
}
