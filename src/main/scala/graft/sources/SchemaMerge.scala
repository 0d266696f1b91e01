package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Dynamic-schema handling for Mongo-style heterogeneous documents
  * (SURVEY.md §7.4): the reference's source has NO schema — different
  * documents in one collection can carry different fields (index.js
  * passes rows through untouched). Spark needs one StructType per
  * DataFrame, so ragged batches are reconciled by the union-of-fields /
  * null-fill policy: every column that appears anywhere appears in the
  * result, absent values are NULL, and column types must agree where
  * they co-occur (a genuine type conflict is an error — silent coercion
  * would corrupt data).
  */
object SchemaMerge {

  /** Union N ragged frames under the union-of-fields / null-fill policy.
    * Column order: first-seen across the inputs (stable, deterministic).
    */
  def unionRagged(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionRagged of zero frames")
    val fields = scala.collection.mutable.LinkedHashMap[String,
      org.apache.spark.sql.types.DataType]()
    dfs.foreach(_.schema.fields.foreach { f =>
      fields.get(f.name) match {
        case None => fields(f.name) = f.dataType
        case Some(t) if t == f.dataType => ()
        case Some(t) =>
          throw new IllegalArgumentException(
            s"type conflict for column '${f.name}': $t vs ${f.dataType}")
      }
    })
    val aligned = dfs.map { df =>
      val have = df.columns.toSet
      df.select(fields.toSeq.map { case (n, t) =>
        if (have(n)) col(n) else lit(null).cast(t).as(n)
      }: _*)
    }
    aligned.reduce(_.unionByName(_))
  }
}
