package graft.queries

object SimilarityQueries {
  def all: Seq[Q] = Seq()
}
