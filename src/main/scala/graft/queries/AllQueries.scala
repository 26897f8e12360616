package graft.queries

/** Complete registry of operator queries (SURVEY.md §2 inventory plus the
  * training-data-pipeline operators). SparkEntry derives its `queries`
  * and `oracleSql` maps from here. */
object AllQueries {
  val all: Seq[GQuery] =
    AggQueries.all ++ FilterJoinQueries.all ++ WindowSetQueries.all ++
      FunctionQueries.all ++ PipelineQueries.all ++ ExtraQueries.all ++
      TpchQueries.all

  require(all.map(_.name).distinct.size == all.size, "duplicate query names")
}
