package graft

object SimilarityQueries {
  val entries: Seq[QueryDef] = Seq()
}
