package graft

object NetQueries {
  val entries: Seq[QueryDef] = Seq()
}
