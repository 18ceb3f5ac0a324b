package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc measurement harness (dev tool). */
object SimhashCal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val exact = graft.operators.Similarity.annBruteForce(spark, dir)
        .select("vec_id").as[Long].collect().toSet
      // LSH candidates via annLsh internals at various configs: reflectively
      // rebuild bucketed/candidate logic (copy of private code paths)
      val emb = graft.Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("ev"))
      def planeVector(tbl: Int, p: Int): Seq[Double] = {
        val rnd = new java.util.Random(tbl * 1031L + p * 7919L)
        Seq.fill(64)(rnd.nextDouble() * 2 - 1)
      }
      def bucket(tbl: Int, planes: Int) =
        (0 until planes).map { p =>
          val proj = graft.functions.VecDot.vec_dot(col("ev"), typedlit(planeVector(tbl, p)))
          when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b))
      for ((tables, planes) <- Seq((4, 6), (8, 6), (8, 4), (16, 6), (12, 5))) {
        val bk = emb.select(col("vec_id"),
          explode(array((0 until tables).map(tb =>
            struct(lit(tb).as("tbl"), bucket(tb, planes).as("bucket"))): _*)).as("tb"))
          .select(col("vec_id"), col("tb.tbl"), col("tb.bucket"))
        val qid = bk.agg(min(col("vec_id"))).collect()(0).getLong(0)
        val qb = bk.filter(col("vec_id") === qid)
          .select(col("tbl"), col("bucket")).collect().map(r => (r.getInt(0), r.getLong(1))).toSet
        val cands = bk.filter(col("vec_id") =!= qid)
          .collect().filter(r => qb.contains((r.getInt(1), r.getLong(2))))
          .map(_.getLong(0)).toSet
        println(s"LSH $sf T=$tables P=$planes covered=${exact.count(cands.contains)}/10 cands=${cands.size}")
      }
      // IVF probe coverage
      val centroids = graft.operators.Similarity.ivfCentroids(spark, dir)
      val vecs = emb.as[(Long, Array[Double])].collect()
      val qv = vecs.minBy(_._1)._2
      def nearest(v: Array[Double]): Int =
        centroids.indices.minBy { c =>
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - centroids(c)(i); d += t*t; i += 1 }; d }
      val assign = vecs.map { case (id, v) => id -> nearest(v) }.toMap
      val probeOrder = centroids.indices.sortBy { c =>
        var d = 0.0; var i = 0
        while (i < qv.length) { val t = qv(i) - centroids(c)(i); d += t*t; i += 1 }; d }
      for (np <- Seq(4, 6, 8, 10)) {
        val probes = probeOrder.take(np).toSet
        println(s"IVF $sf nprobe=$np covered=${exact.count(id => probes.contains(assign(id)))}/10")
      }
    }
    spark.stop()
  }
}
