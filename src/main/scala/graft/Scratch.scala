package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Sessions.local("32", logLevel = "ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    if (args.length > 1 && args(1) == "time") {
      // Repeat-time one query in a warm JVM: where did the floor go?
      val name = args(2)
      val q = SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        q(spark, d).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        println(f"[scratch] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "explain") {
      args.drop(2).headOption.flatMap(SparkEntry.queries.get) match {
        case Some(q) => q(spark, d).explain("formatted")
        case None => println(
          s"usage: Scratch <sfDir> explain <query>; known queries: " +
            SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "beam") {
      import org.apache.spark.sql.Row
      val brute = graft.operators.Similarity.bruteTopK(spark, d)
        .select("qid", "cid").collect().map { case Row(q: Long, c: Long) => (q, c) }.toSet
      for (beam <- Seq(8, 16, 32); rounds <- Seq(3, 4, 6)) {
        val g = graft.operators.Similarity.graphTopK(spark, d, beam = beam, rounds = rounds)
          .select("qid", "cid").collect().map { case Row(q: Long, c: Long) => (q, c) }.toSet
        spark.catalog.clearCache()
        println(f"[scratch] beam=$beam rounds=$rounds recall@5=${brute.count(g.contains).toDouble / brute.size}%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "layered-sweep") {
      import org.apache.spark.sql.Row
      val brute = graft.operators.Similarity.bruteTopK(spark, d)
        .select("qid", "cid").collect().map { case Row(q: Long, c: Long) => (q, c) }.toSet
      spark.catalog.clearCache()
      for (rounds <- 3 to 8) {
        def recall(df: org.apache.spark.sql.DataFrame): Double = {
          val g = df.select("qid", "cid").collect()
            .map { case Row(q: Long, c: Long) => (q, c) }.toSet
          spark.catalog.clearCache()
          brute.count(g.contains).toDouble / brute.size
        }
        val ex = recall(graft.operators.Similarity
          .graphLayeredTopK(spark, d, rounds = rounds))
        val ba = recall(graft.operators.Similarity
          .graphLayeredBandedTopK(spark, d, rounds = rounds))
        println(f"[scratch] layered rounds=$rounds exact=$ex%.3f banded=$ba%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "banded-knobs") {
      import org.apache.spark.sql.Row
      val brute = graft.operators.Similarity.bruteTopK(spark, d)
        .select("qid", "cid").collect().map { case Row(q: Long, c: Long) => (q, c) }.toSet
      spark.catalog.clearCache()
      for (beam <- Seq(24, 32, 40); rounds <- Seq(5, 6)) {
        val g = graft.operators.Similarity
          .graphLayeredBandedTopK(spark, d, beam = beam, rounds = rounds)
          .select("qid", "cid").collect()
          .map { case Row(q: Long, c: Long) => (q, c) }.toSet
        spark.catalog.clearCache()
        println(f"[scratch] banded beam=$beam rounds=$rounds recall=${brute.count(g.contains).toDouble / brute.size}%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "pq-eta") {
      import org.apache.spark.sql.Row
      val brute = graft.operators.Similarity.bruteTopK(spark, d)
        .select("qid", "cid").collect().map { case Row(q: Long, c: Long) => (q, c) }.toSet
      for (eta <- Seq(1, 2, 3); it <- Seq(1, 2, 3, 4)) {
        val adc = graft.operators.Similarity.pqTrainedAdcTopK(spark, d, eta = eta, iters = it)
          .select("qid", "cid").collect().map { case Row(q: Long, c: Long) => (q, c) }.toSet
        spark.catalog.clearCache()
        println(f"[scratch] pq eta=$eta iters=$it raw-ADC recall@5=${brute.count(adc.contains).toDouble / brute.size}%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "ivfpq-recall") {
      import org.apache.spark.sql.Row
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "cid").collect()
          .map { case Row(q: Long, c: Long) => (q, c) }.toSet
      val brute = graft.operators.Similarity.bruteTopK(spark, d)
        .select(org.apache.spark.sql.functions.col("qid"), org.apache.spark.sql.functions.col("cid"))
        .collect().map { case Row(q: Long, c: Long) => (q, c) }.toSet
      spark.catalog.clearCache()
      for ((name, df) <- Seq(
          "stub-composed" -> graft.operators.Similarity.ivfPqTopK(spark, d),
          "trained-composed" -> graft.operators.Similarity.ivfPqTrainedTopK(spark, d),
          "pq-trained" -> graft.operators.Similarity.pqTrainedTopK(spark, d))) {
        val r = brute.count(pairs(df).contains).toDouble / brute.size
        spark.catalog.clearCache()
        println(f"[scratch] ivfpq $name recall@5=$r%.3f")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "navplan") {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val build = graft.operators.Similarity.navGraphBuild(spark, d)
      val plan = build.queryExecution.executedPlan.toString
      plan.linesIterator.zipWithIndex.foreach { case (l, i) =>
        if (l.contains("BroadcastExchange"))
          println(s"[scratch] L$i: ${l.trim.take(200)}")
      }
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/navplan.txt"),
        plan.getBytes("UTF-8"))
      println(s"[scratch] plan dumped, " +
        s"${"BroadcastExchange".r.findAllIn(plan).length} broadcasts")
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "bpe-passes") {
      val docs = graft.sources.Tables.documents(spark, d)
      for (b <- Seq(1, 8)) {
        val t0 = System.nanoTime()
        val (tab, passes) = graft.operators.TextAnalytics.vocabTrainRaw(docs, 12, b)
        println(f"[scratch] bpe batch=$b merges=${tab.size} passes=$passes " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.stop(); return
    }
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("dedup_clusters")
    for (name <- names; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[scratch] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
