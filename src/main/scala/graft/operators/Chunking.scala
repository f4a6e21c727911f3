package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sliding-window document chunking — the retrieval/context-window prep
  * step of an LLM data pipeline: each document becomes overlapping
  * fixed-size token windows (`size` tokens, advancing by `stride`).
  *
  * Scale design: chunking is a pure per-row generator — tokenize, compute
  * the chunk count arithmetically, `explode` a `sequence` of chunk
  * indices, and `slice` the token array per index. No shuffle, no UDF,
  * full whole-stage codegen; output size is input size × overlap factor,
  * produced map-side at scan speed. At 100 TB the operator is embarrassingly
  * parallel and composes with downstream packing/dedup without an exchange.
  */
object Chunking {

  /** Explode `textCol` into overlapping token windows.
    *
    * Output: (idCol, chunk_ix, n_chunk_tokens, chunk_text). A document
    * with `n` tokens yields `1 + ceil(max(n - size, 0) / stride)` chunks
    * (always ≥ 1, so empty docs keep one empty chunk row and no data is
    * silently dropped). The last window may be shorter than `size`;
    * windows never start past the text.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size > 0, s"chunk size must be positive, got $size")
    require(stride > 0 && stride <= size,
      s"stride must be in [1, size=$size], got $stride")
    val ws = TextFunctions.tokens(col(textCol))
    val n = TextFunctions.tokenCount(col(textCol))
    // ceil((n - size) / stride) via exact integer arithmetic; all values
    // stay far below 2^52 so the double division in floor() is exact.
    val extra = greatest(n - size, lit(0L))
    val nChunks = floor((extra + (stride - 1)) / lit(stride)) + 1
    df.select(col(idCol), ws.as("_ws"), n.as("_n"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_ix"))
      .select(col(idCol), col("chunk_ix"),
        least(lit(size.toLong), col("_n") - col("chunk_ix") * stride)
          .as("n_chunk_tokens"),
        array_join(slice(col("_ws"),
          (col("chunk_ix") * stride + 1).cast("int"), lit(size)), " ")
          .as("chunk_text"))
  }
}
