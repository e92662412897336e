package graft.queries

object RelationalQueries {
  def all: Seq[Q] = Seq()
}
