"""G1-G5: grouping / ordered-concat operators from the reference.

* G1 QA assembly (stackexchangeContentSite.py:295-328): questions keep their
  body prefixed '[QUESTION]', answers append '[ANSWER]'+body in document
  order; orphan answers drop (inner on the answer side), unanswered questions
  keep (left on the question side).
* G3 document reassembly (postgresVectorDb.py:586-607): chunks of a url sorted
  by chunk_no, concatenated with no separator.
* G2 last-edit coalesce, G5 round-robin split.

Physical notes: ordered concat uses sort_array(collect_list(struct(order,
text))) — a single-shuffle hash aggregation; never a global orderBy.  For the
skewed case (one question with millions of answers) pre-aggregate per (key,
salt) then merge (operators/skew.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ordered_concat(
    df: DataFrame,
    key_col: str,
    order_col: str,
    text_col: str,
    out_col: str = "doc",
    sep: str = "",
) -> Column | DataFrame:
    """groupBy(key).ordered-concat(text by order): G3's shape."""
    assembled = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct(F.col(order_col), F.col(text_col)))),
            lambda s: s[text_col],
        ),
        sep,
    ).alias(out_col)
    return df.groupBy(key_col).agg(assembled)


def assemble_qa(
    questions: DataFrame,
    answers: DataFrame,
    q_id: str = "post_id",
    a_parent: str = "parent_id",
    a_order: str = "post_id",
    q_body: str = "body",
    a_body: str = "body",
    out_col: str = "post_body_for_llm",
) -> DataFrame:
    """G1: '[QUESTION]'+q_body + concat of '[ANSWER]'+a_body in answer order.

    Left join keeps unanswered questions; orphan answers (no parent) vanish
    with the join — exactly the reference's try/except drop (:324-328).
    """
    ans = answers.select(
        F.col(a_parent).alias(q_id),
        F.col(a_order).alias("_ord"),
        F.concat(F.lit("[ANSWER]"), F.col(a_body)).alias("_ans"),
    )
    ans_concat = ans.groupBy(q_id).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("_ord"), F.col("_ans")))),
                lambda s: s["_ans"],
            ),
            "",
        ).alias("_answers")
    )
    return (
        questions.join(ans_concat, q_id, "left")
        .withColumn(
            out_col,
            F.concat(F.lit("[QUESTION]"), F.col(q_body), F.coalesce(F.col("_answers"), F.lit(""))),
        )
        .drop("_answers")
    )


def coalesce_last_edit(
    df: DataFrame,
    last_edit: str = "last_edit_date",
    creation: str = "creation_date",
    out_col: str = "last_edit_date_final",
) -> DataFrame:
    """G2 (stackexchangeContentSite.py:305-310): LastEditDate ?? CreationDate
    ?? now()."""
    return df.withColumn(
        out_col, F.coalesce(F.col(last_edit), F.col(creation), F.current_timestamp())
    )


def round_robin_split(df: DataFrame, n: int, order_col: str, out_col: str = "worker") -> DataFrame:
    """G5 (aiwhisprBaseClasses.py:324-387): deal rows into n lists in a
    deterministic order — `(row_number - 1) % n`.  (Spark's physical
    round-robin is `repartition(n)`; this column form exists for parity
    checks where the assignment itself is the output.)"""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col(order_col))
    return df.withColumn(out_col, ((F.row_number().over(w) - 1) % n).cast("int"))
