package graft.matrix

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row/column vector and scalar views over sparse COO data — the
  * reference's `RowVector`/`ColVector`/`DiagonalMatrix`/`Scalar`
  * abstractions (mathematics/Matrix.scala:184-187, 706-723) on
  * DataFrames. A vector is (idx, val); zero entries are absent.
  */
final case class RowVector(df: DataFrame) {

  import Matrix.{C, R, V}

  def transpose: ColVector = ColVector(df)

  /** v * M : (1×n)(n×m) = 1×m. */
  def *(m: Matrix): RowVector =
    RowVector(df.select(col("idx").as("k"), col(V).as("v_val"))
      .join(m.df.select(col(R).as("k"), col(C), col(V)), "k")
      .groupBy(col(C).as("idx"))
      .agg(sum(col("v_val") * col(V)).as(V)))

  def *(k: Double): RowVector = RowVector(df.withColumn(V, col(V) * k))

  /** Sparse add: union + sum, exact-zero results dropped (reference
    * vector arithmetic routes through Matrix.+ and its monoid
    * nonZeroOption).
    */
  def +(other: RowVector): RowVector =
    RowVector(df.unionByName(other.df).groupBy("idx").agg(sum(V).as(V))
      .filter(col(V) =!= 0.0))

  /** Σ vᵢ·wᵢ — a Scalar. */
  def dot(other: ColVector): DataFrame =
    df.alias("a").join(other.df.alias("b"), "idx")
      .agg(sum(col(s"a.$V") * col(s"b.$V")).as("scalar"))

  def l1Normalize: RowVector = {
    val total = df.agg(sum(abs(col(V))).as("__n"))
    RowVector(df.crossJoin(broadcast(total))
      .select(col("idx"), (col(V) / col("__n")).as(V)))
  }

  def sum_ : DataFrame = df.agg(sum(V).as("scalar"))

  /** Place on a matrix diagonal (DiagonalMatrix). */
  def diag: Matrix =
    Matrix(df.select(col("idx").as(R), col("idx").as(C), col(V)))

  /** Element-wise 1/x, zeros ignored (reference
    * DiagonalMatrix.inverse, Matrix.scala:749-755 — `v.inverse.diag`
    * is the diagonal-matrix inverse used by normalizations).
    */
  def inverse: RowVector =
    RowVector(df.filter(col(V) =!= 0.0)
      .select(col("idx"), (lit(1.0) / col(V)).as(V)))

  /** The vector as a 1×n matrix occupying row `r` (reference
    * RowVector.toMatrix, Matrix.scala:826-833).
    */
  def toMatrix(r: Long): Matrix =
    Matrix(df.select(lit(r).as(R), col("idx").as(C), col(V)))

  def topElems(k: Int): RowVector = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(V).desc, col("idx"))
    RowVector(df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn"))
  }
}

final case class ColVector(df: DataFrame) {

  import Matrix.{C, R, V}

  def transpose: RowVector = RowVector(df)

  /** M * v : (n×m)(m×1) = n×1. */
  def leftMultiply(m: Matrix): ColVector =
    ColVector(m.df.select(col(R), col(C).as("idx"), col(V).as("m_val"))
      .join(df, "idx")
      .groupBy(col(R).as("idx"))
      .agg(sum(col("m_val") * col(V)).as(V)))

  def *(k: Double): ColVector = ColVector(df.withColumn(V, col(V) * k))

  /** Sparse add — union + sum, absent entries are zero and exact-zero
    * results are dropped (reference ColVector arithmetic via toMatrix
    * addition and its monoid nonZeroOption, Matrix.scala:894).
    */
  def +(other: ColVector): ColVector =
    ColVector(df.unionByName(other.df).groupBy("idx").agg(sum(V).as(V))
      .filter(col(V) =!= 0.0))

  def -(other: ColVector): ColVector = this + (other * -1.0)

  /** Σ |vᵢ| as a 1-row scalar frame — the convergence read-back of
    * iterative jobs (reference WeightedPageRankFromMatrix
    * measureConvergenceAndStore, examples/WeightedPageRankFromMatrix
    * .scala:94-99). Coalesced to 0.0: a sparse vector at its exact
    * fixpoint is the EMPTY frame (zero-dropping subtraction), and
    * sum-of-nothing must read as converged, not NULL.
    */
  def l1Norm: DataFrame =
    df.agg(coalesce(sum(abs(col(V))), lit(0.0)).as("scalar"))

  /** Place on a matrix diagonal (reference ColVector.diag,
    * Matrix.scala:905).
    */
  def diag: Matrix =
    Matrix(df.select(col("idx").as(R), col("idx").as(C), col(V)))

  /** Element-wise 1/x, zeros ignored (reference
    * DiagonalMatrix.inverse via toCol, Matrix.scala:749-755).
    */
  def inverse: ColVector =
    ColVector(df.filter(col(V) =!= 0.0)
      .select(col("idx"), (lit(1.0) / col(V)).as(V)))

  /** The vector as an n×1 matrix occupying column `c` (reference
    * ColVector.toMatrix, Matrix.scala:897-903).
    */
  def toMatrix(c: Long): Matrix =
    Matrix(df.select(col("idx").as(R), lit(c).as(C), col(V)))

  /** Outer product v wᵀ — a full matrix. */
  def outer(row: RowVector): Matrix =
    Matrix(df.select(col("idx").as(R), col(V).as("c_val"))
      .crossJoin(row.df.select(col("idx").as(C), col(V).as("r_val")))
      .select(col(R), col(C), (col("c_val") * col("r_val")).as(V)))
}

object Vectors {
  /** Extract row `r` of a matrix as a RowVector. */
  def rowOf(m: Matrix, r: Long): RowVector =
    RowVector(m.df.filter(col(Matrix.R) === r)
      .select(col(Matrix.C).as("idx"), col(Matrix.V)))

  /** Extract column `c` as a ColVector. */
  def colOf(m: Matrix, c: Long): ColVector =
    ColVector(m.df.filter(col(Matrix.C) === c)
      .select(col(Matrix.R).as("idx"), col(Matrix.V)))

  def fromSeq(spark: org.apache.spark.sql.SparkSession,
      entries: Seq[(Long, Double)]): DataFrame = {
    import spark.implicits._
    entries.toDF("idx", Matrix.V)
  }
}
