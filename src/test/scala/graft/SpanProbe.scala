package graft

import org.apache.spark.sql.functions._

/** Scratch phase-timing probe for maximalDupSpans (dev-only). */
object SpanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local(32)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.load(spark, dir, "documents")
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[spanprobe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the session + parquet scan
    t("warm_count")(docs.count())
    val minLen = 6
    val toks = docs.select(col("doc_id"),
        split(trim(col("text")), " ").as("t"))
      .where(size(col("t")) >= minLen)
      .select(col("doc_id"), col("t"), size(col("t")).cast("long").as("n"))
      .localCheckpoint(eager = false)
    val ps = toks.select(col("doc_id"),
        explode(transform(sequence(lit(0), (col("n") - minLen).cast("int")),
          i => struct(i.cast("long").as("p"),
            concat_ws(" ", slice(col("t"), i + 1, lit(minLen))).as("g"))))
          .as("sh"))
      .select(col("doc_id"), col("sh.p").as("p"), col("sh.g").as("g"))
      .localCheckpoint(eager = false)
    val hot0 = ps.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .where(col("nd") >= 2).select(col("g"))
    val ids0 = t("ids0_ckpt")(
      hot0.withColumn("r", monotonically_increasing_id())
        .localCheckpoint(eager = true))
    val d0 = t("d0_ckpt")(ps.join(ids0, "g")
      .select(col("doc_id"), col("p"), col("r"))
      .localCheckpoint(eager = true))
    println(s"[spanprobe] d0 rows ${d0.count()}")
    var dj = d0
    var lj = minLen.toLong
    var go = true
    var lvl = 0
    while (go && lvl < 8) {
      val right = dj.select(col("doc_id"), (col("p") - lj).as("p"),
        col("r").as("r2"))
      val pairs = dj.select(col("doc_id"), col("p"), col("r").as("r1"))
        .join(right, Seq("doc_id", "p"))
        .localCheckpoint(eager = false)
      val ids = t(s"lvl${lvl}_ids")(
        pairs.groupBy(col("r1"), col("r2"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .where(col("nd") >= 2).select(col("r1"), col("r2"))
          .withColumn("r", monotonically_increasing_id())
          .localCheckpoint(eager = true))
      if (t(s"lvl${lvl}_empty")(ids.isEmpty)) go = false
      else {
        dj = t(s"lvl${lvl}_dn")(pairs.join(ids, Seq("r1", "r2"))
          .select(col("doc_id"), col("p"), col("r"))
          .localCheckpoint(eager = true))
        println(s"[spanprobe] lvl$lvl dn rows ${dj.count()} at L=${lj * 2}")
        lj *= 2
        lvl += 1
      }
    }
    val full = t("full_operator")(
      graft.operators.Dedup.dupSpanCensusUnbounded(docs, "doc_id", "text")
        .collect().length)
    println(s"[spanprobe] census rows $full")
    spark.stop()
  }
}
