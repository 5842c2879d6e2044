"""TF-IDF keyword extraction: top terms per document group.

The vocabulary/keyword step of a corpus-analysis pipeline: build the
corpus document-frequency table once, score per-group term frequencies
against it, and keep each group's top-k terms.  Complements the
quality/language/repetition family (``text_ops``) with the classic
corpus-statistics view.

Engine shape: one explode of the staged token array feeds BOTH
aggregations — document frequency is ``count(DISTINCT doc)`` per token,
term frequency is ``count(*)`` per ``(group, token)`` — joined on token
(co-partitioned shuffle, no broadcast needed: the vocabulary can be
huge at 100 TB and the join key is the natural partitioning), then one
window per group takes the top-k.  Ranking uses the ROUNDED score
(ties broken on the term) so the order is reproducible across engines
— raw float ordering would expose libm ULP differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_ws

__all__ = ["tfidf_top_terms"]


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    top_k: int = 5,
) -> DataFrame:
    """Top-k terms per group by smoothed TF-IDF.

    ``tfidf = tf * ln((N + 1) / (df + 1))`` with ``N`` = number of
    documents with at least one token, ``df`` = documents containing the
    term, ``tf`` = occurrences within the group.  Returns
    ``(group_col, term, tf, df, tfidf, term_rank)``, ``term_rank`` 1..k
    by ``(round(tfidf, 4) DESC, term ASC)``.
    """
    toks = docs.select(
        F.col(id_col),
        F.col(group_col),
        F.split(normalize_ws(text_col), " ").alias("__t"),
    ).filter(F.size("__t") >= 1)
    # N needs no explode: whitespace-normalized splits contain no empty
    # tokens unless the whole text is blank, so "has >= 1 real token"
    # is decidable on the array
    n_docs = toks.filter(F.expr("exists(__t, x -> x != '')")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    terms = toks.select(
        F.col(id_col), F.col(group_col), F.explode("__t").alias("term")
    ).filter(F.col("term") != "")

    # ONE explode feeds both aggregations for real: df and tf both
    # derive from the per-(term, doc) pre-aggregate, whose exchange is
    # identical in both branches — Spark plans it as a ReusedExchange,
    # so the corpus is tokenized and shuffled once, not three times
    per_doc = terms.groupBy("term", id_col, group_col).agg(
        F.count(F.lit(1)).alias("__c")
    )
    df_tab = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    tf_tab = per_doc.groupBy(group_col, "term").agg(
        F.sum("__c").cast("bigint").alias("tf")
    )

    scored = (
        tf_tab.join(df_tab, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)), 4
            ),
        )
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= top_k)
        .select(group_col, "term", "tf", "df", "tfidf", "term_rank")
    )
