package graft

object DedupQueries {
  val entries: Seq[QueryDef] = Seq()
}
