package graft

/** Single source of truth for the engine's capability inventory
  * (SURVEY.md §2). Each operator group contributes its GQueries here;
  * SparkEntry derives the driver contract maps from this list.
  */
object Registry {
  def all: Seq[GQuery] =
    operators.RelationalQueries.all ++
      operators.AsOfJoin.queries ++
      operators.Dedup.all ++
      operators.DupClusters.all ++
      operators.Similarity.all ++
      operators.TextOps.all ++
      operators.Multimodal.all ++
      operators.Discovery.all ++
      sources.Sources.all ++
      streaming.Streaming.all ++
      Sql.all

  def byName: Map[String, GQuery] = all.map(q => q.name -> q).toMap
}
