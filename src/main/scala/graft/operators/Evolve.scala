package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution union (SURVEY.md §2.7 U1/U2).
  *
  * The reference's `evolve` mode appends into an existing store, creating
  * missing columns, NULL-filling absent ones, and relaxing conflicting
  * column types to text (`/root/reference/docs/options.md:425-458`). The
  * Spark-native equivalent is `unionByName(allowMissingColumns = true)`
  * plus an explicit conflict-relaxation pass — no custom node needed;
  * Catalyst still prunes and pushes through the union.
  */
object Evolve {

  /** Union any number of differently-shaped DataFrames by column name.
    * Missing columns → NULL; same-name columns with incompatible types →
    * both cast to string (the reference's postgres rule). Column order:
    * first-seen across the inputs.
    */
  def unionEvolve(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionEvolve of zero inputs")
    // first-seen column order with resolved types
    val ordered = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    dfs.foreach(_.schema.fields.foreach { f =>
      ordered.get(f.name) match {
        case None                           => ordered += f.name -> f.dataType
        case Some(t) if t == f.dataType     => ()
        case Some(t) if numericMerge(t, f.dataType).isDefined =>
          ordered += f.name -> numericMerge(t, f.dataType).get
        case Some(_)                        => ordered += f.name -> StringType
      }
    })
    val aligned = dfs.map { df =>
      val present = df.schema.fields.map(f => f.name -> f.dataType).toMap
      df.select(ordered.toSeq.map { case (name, target) =>
        present.get(name) match {
          case Some(t) if t == target => col(s"`$name`")
          case Some(_)                => col(s"`$name`").cast(target)
          case None                   => lit(null).cast(target).as(name)
        }
      }: _*)
    }
    aligned.reduce(_.unionAll(_))
  }

  /** Widen only within the integral chain or within the fractional chain.
    * A cross-kind merge (Long ⊔ Double, Int ⊔ Float, …) falls through to
    * the string relaxation: casting Long ids to Double silently corrupts
    * values above 2^53 (2^24 for Float) — the same corruption the decimal
    * rule below avoids, and the reference's behavior for conflicting
    * types is relax-to-text anyway (`docs/options.md:425-443`). Decimals
    * (or anything off the two chains) also fall through.
    */
  private def numericMerge(a: DataType, b: DataType): Option[DataType] = {
    def within(rank: Seq[DataType]): Option[DataType] = {
      val ia = rank.indexOf(a); val ib = rank.indexOf(b)
      if (ia >= 0 && ib >= 0) Some(rank(math.max(ia, ib))) else None
    }
    within(Seq(ByteType, ShortType, IntegerType, LongType))
      .orElse(within(Seq(FloatType, DoubleType)))
  }
}
