package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: distribution of pairwise SimHash Hamming distances
  * over the natural documents corpus — informs the honest `maxHamming` for
  * the x7 oracle (any natural pair at or below the threshold would break a
  * planted-pairs-only oracle).
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), graft.ops.Dedup.simhash64(col("text")).as("sig"))
    val a = d.alias("a"); val b = d.alias("b")
    val ham = a.join(b, col("a.id") < col("b.id"))
      .select(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("h"))
    ham.groupBy("h").count().orderBy("h").show(20)
    // the hamming-0 natural pairs: are they token-multiset-identical?
    val txt = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val z = a.join(b, col("a.id") < col("b.id"))
      .where(bit_count(col("a.sig").bitwiseXOR(col("b.sig"))) === 0)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val withTxt = z
      .join(txt.select(col("id").as("id_a"), col("text").as("t_a")), Seq("id_a"))
      .join(txt.select(col("id").as("id_b"), col("text").as("t_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (sort_array(graft.ops.TextAnalysis.tokens(col("t_a"))) ===
          sort_array(graft.ops.TextAnalysis.tokens(col("t_b")))).as("same_multiset"),
        (col("t_a") === col("t_b")).as("same_text"),
        substring(col("t_a"), 1, 60).as("ta"), substring(col("t_b"), 1, 60).as("tb"))
    withTxt.show(10, truncate = false)
    val empty = spark.read.parquet(s"$dir/documents.parquet")
      .where(length(trim(col("text"))) === 0).count()
    println(s"empty docs: $empty")
    spark.stop()
  }
}
