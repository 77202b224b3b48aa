package graft

object WindowQueries {
  val entries: Seq[QueryDef] = Seq()
}
