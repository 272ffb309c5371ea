package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.matrix.{ColVector, Matrix}

/** The reference's seven matrix tutorials
  * (tutorial/MatrixTutorial0-6.scala) as library pipelines — the
  * canonical worked examples of the Matrix API, ported 1:1 so each
  * operator composition they exercise (zip + mapValues painting,
  * diagonal masking, vector/matrix round-trips, normalized products)
  * stays covered end-to-end.
  *
  * Every pipeline is a pure plan transform: no collects, every join is
  * a product/broadcast shape already audited in the Matrix library.
  */
object MatrixTutorials {

  /** Out-degree of every node: sum out the columns
    * (MatrixTutorial0.scala:17-28, GraphOutDegreeJob).
    */
  def outDegree(adjacency: Matrix): ColVector = adjacency.sumColVector

  /** Co-follows between any two nodes: A·Aᵀ
    * (MatrixTutorial1.scala:18-28, CofollowsJob).
    */
  def cofollows(adjacency: Matrix): Matrix = adjacency * adjacency.transpose

  /** Keep only rows whose out-degree is under `maxOutdegree`: mask by
    * a binarized filtered-degree diagonal
    * (MatrixTutorial2.scala:17-39, FilterOutdegreeJob).
    */
  def filterByOutDegree(adjacency: Matrix, maxOutdegree: Double): Matrix = {
    val outdegree = adjacency.sumColVector
    val outdegreeFiltered = outdegree.toMatrix(1)
      .filterValues(col(Matrix.V) < maxOutdegree)
      .binarizeAs()
      .getCol(1)
    outdegreeFiltered.diag * adjacency
  }

  /** Intersection and both set differences of two graphs
    * (MatrixTutorial3.scala:18-37, ComputeMatrixIntersectionJob).
    */
  def intersection(a1: Matrix, a2: Matrix): (Matrix, Matrix, Matrix) = {
    val inter = a1.zipMap(a2)((x, y) =>
      when(x > 0 && y > 0, 1.0).otherwise(0.0))
    (inter, a1 - inter, a2 - inter)
  }

  /** Cosine similarity of every row pair: L2-normalize, then the
    * normalized inner products (MatrixTutorial4.scala:17-32,
    * ComputeCosineJob).
    */
  def cosineSimilarity(adjacency: Matrix): Matrix = {
    val normMatrix = adjacency.rowL2Normalize
    normMatrix * normMatrix.transpose
  }

  /** Jaccard similarity of every row pair: |i∩j| / (|i|+|j|−|i∩j|),
    * with the set sizes painted onto the intersection matrix by zip
    * (MatrixTutorial5.scala:18-44, ComputeJaccardJob — which, like the
    * reference, presumes a symmetric graph: it takes the second
    * operand's sizes from COLUMN sums, so on a directed graph pairs
    * with an empty painted union divide by zero and surface as ∞,
    * exactly as the reference's arithmetic does).
    */
  def jaccardSimilarity(adjacency: Matrix): Matrix = {
    val aBinary = adjacency.binarizeAs()
    val intersectMat = aBinary * aBinary.transpose
    val aSumVct = aBinary.sumColVector
    val bSumVct = aBinary.sumRowVector

    val xMat = intersectMat.zipMapCol(aSumVct)((_, u) => u)
    val yMat = intersectMat.zipMapRow(bSumVct)((_, u) => u)

    val unionMat = xMat + yMat - intersectMat
    // SQL division by zero is NULL (non-ANSI), but the reference's JVM
    // arithmetic gives +∞ for the empty-painted-union pairs — keep its
    // exact output (intersection counts are strictly positive)
    intersectMat.zipMap(unionMat)((x, y) =>
      when(y === 0.0, lit(Double.PositiveInfinity)).otherwise(x / y))
  }

  /** Per-document top-k TF-IDF terms (MatrixTutorial6.scala:18-40,
    * TfIdfJob): idf from the L1-normalized document frequencies,
    * painted across the term-frequency matrix, Hadamard product,
    * per-row top-k.
    */
  def tfIdf(docWordMatrix: Matrix, nrWords: Int): Matrix = {
    val docFreq = docWordMatrix.binarizeAs().sumRowVector
    val invDocFreqVct = docFreq.toMatrix(1).rowL1Normalize
      .mapValues(x => log2(lit(1.0) / x))
    val invDocFreqMat =
      docWordMatrix.zipMapRow(invDocFreqVct.getRow(1))((_, u) => u)
    docWordMatrix.hProd(invDocFreqMat).topRowElems(nrWords)
  }

  private def log2(x: org.apache.spark.sql.Column) =
    log(x) / log(lit(2.0))
}
